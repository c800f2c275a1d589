package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bpe

/** BPE vocabulary induction against an independent scalar reference:
  * same argmax/tiebreak rule, same greedy left-to-right merge
  * application, checked merge-by-merge and on the final encoding. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- independent reference implementation (plain Scala) ----------

  private def refPairs(syms: Vector[String]): Seq[(String, String)] =
    if (syms.length < 2) Nil else syms.sliding(2).map(s => (s(0), s(1))).toSeq

  private def refApply(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def refLearn(vocab: Map[String, Long], n: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    var syms = vocab.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- syms; p <- refPairs(s))
        counts(p) = counts.getOrElse(p, 0L) + c
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) continue = false
      else {
        val (pair, _) = eligible.toSeq
          .sortBy { case ((a, b), cnt) => (-cnt, a, b) }.head
        merges += pair
        syms = syms.map { case (s, c) => (refApply(s, pair._1, pair._2), c) }
      }
    }
    merges.toSeq
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] =
    text.split(" ", -1).toSeq.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (a, b)) => refApply(s, a, b)
      }
    }

  // ---- fixtures ----------------------------------------------------

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new").toDF("text")

  private val refVocab = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "wider" -> 2L, "new" -> 2L)

  test("vocabulary: corpus-level word counts match") {
    val v = Bpe.vocabulary(corpus, col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == refVocab)
  }

  test("learn: merge table matches the reference, merge by merge") {
    val got = Bpe.learnFromCorpus(spark, corpus, col("text"), nMerges = 8)
    val want = refLearn(refVocab, 8)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty && got.length <= 8)
  }

  test("learn: stops early when no pair clears minCount") {
    val tiny = Seq(("ab", 1L)).toDF("tok", "wc")
    assert(Bpe.learn(tiny, nMerges = 5, minCount = 2L).isEmpty)
    // and learns the one pair when the threshold admits it
    assert(Bpe.learn(tiny, nMerges = 5, minCount = 1L) == Seq(("a", "b")))
  }

  test("encode: matches the reference tokenization under the learned table") {
    val merges = Bpe.learnFromCorpus(spark, corpus, col("text"), nMerges = 6)
    val texts = Seq("low lower newest", "new wider low", "", "unseen word")
    val got = texts.toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(_.getSeq[String](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == refEncode(t, merges), s"text '$t'")
    }
    // zero merges degrade to characters
    val chars = Seq("abc").toDF("text")
      .select(Bpe.encode(col("text"), Nil).as("t")).head.getSeq[String](0)
    assert(chars == Seq("a", "b", "c"))
  }

  test("tokenCounts: dictionary-join counts equal per-occurrence encode lengths") {
    val merges = Bpe.learnFromCorpus(spark, corpus, col("text"), nMerges = 6)
    val docs = graft.queries.t(spark, TestSpark.sfTiny, "documents").limit(200)
    val direct = docs.select(col("doc_id"),
        size(Bpe.encode(col("text"), merges)).cast("long").as("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDict = Bpe.tokenCounts(docs, col("text"), col("doc_id"), merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDict == direct,
      "per-distinct-word dictionary path diverged from per-occurrence encode")
  }

  test("tokenCounts: broadcasts the dictionary, never raw generator output") {
    // r19 (guide §3.1), the library-side twin of the declared
    // q_bpe_encode fix: un-hinted, the planner size-estimates the
    // exploded corpus through Generate as the smaller relation and
    // broadcasts every word occurrence while the aggregate-bounded
    // dictionary streams. tokenCounts now hints broadcast(dict) by
    // default; this gate pins the invariant (mirrors the PlanSpec
    // q_bpe_encode gate) and proves the opt-out keeps value parity.
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val merges = Bpe.learnFromCorpus(spark, corpus, col("text"), nMerges = 4)
    val docs = graft.queries.t(spark, TestSpark.sfTiny, "documents").limit(100)
    val df = Bpe.tokenCounts(docs, col("text"), col("doc_id"), merges)
    df.collect() // finalize AQE
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case o => o.children
    }
    def rawGenerates(p: SparkPlan): Int = p match {
      case _: BaseAggregateExec => 0
      case g: GenerateExec => 1 + kids(g).map(rawGenerates).sum
      case o => kids(o).map(rawGenerates).sum
    }
    var broadcasts = 0
    def check(p: SparkPlan): Unit = {
      p match {
        case b: BroadcastExchangeLike =>
          broadcasts += 1
          assert(rawGenerates(b) == 0,
            s"broadcast of un-aggregated generator output (corpus-sized):\n$b")
        case _ => ()
      }
      kids(p).foreach(check)
    }
    check(df.queryExecution.executedPlan)
    assert(broadcasts >= 1, "expected the dictionary broadcast in the plan")
    // the unboundable-vocabulary opt-out computes the same values
    val hinted = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planner = Bpe.tokenCounts(docs, col("text"), col("doc_id"), merges,
        broadcastDict = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(planner == hinted, "broadcastDict=false diverged")
  }

  test("greedy left-to-right: 'aaa' under (a,a) is [aa, a]") {
    val out = Seq("aaa").toDF("text")
      .select(Bpe.encode(col("text"), Seq(("a", "a"))).as("t"))
      .head.getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }
}
