package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CorpusStats

/** graft.ops.CorpusStats — token frequencies, TF-IDF, repetition
  * metrics, entropy: hand-computed expectations on a fixed corpus plus
  * plan-shape gates (partial aggregation, fixed-point determinism).
  */
class CorpusStatsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 4 docs, vocabulary {a,b,c,d}; counts chosen for hand arithmetic
  private def corpus = Seq(
    (1L, "a a a b"),     // a:3 b:1
    (2L, "a b b c"),     // a:1 b:2 c:1
    (3L, "c c c c"),     // c:4
    (4L, "a d")          // a:1 d:1
  ).toDF("doc_id", "text")

  private def toks = CorpusStats.tokens(corpus, col("text"), col("doc_id"))

  test("tokenFrequencies: tf and df match hand counts") {
    val m = CorpusStats.tokenFrequencies(toks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map("a" -> ((5L, 3L)), "b" -> ((3L, 2L)),
      "c" -> ((5L, 2L)), "d" -> ((1L, 1L))))
  }

  test("tfIdf: fixed-point scores are exact integers matching ln formula") {
    def idfFp(df: Long): Long = math.round(math.log(5.0 / (df + 1)) * 1e6)
    val rows = CorpusStats.tfIdf(toks, nDocs = 4L).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(rows((1L, "a")) == 3 * idfFp(3))
    assert(rows((3L, "c")) == 4 * idfFp(2))
    assert(rows((4L, "d")) == 1 * idfFp(1))
  }

  test("tfIdfTop: rank orders by score desc then token, k bounds rows") {
    val top = CorpusStats.tfIdfTop(toks, 4L, 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: a has tf 3 but the lowest idf (df 3); b (tf 1, df 2) wins
    // iff 3*ln(5/4) < 1*ln(5/3): 0.669 vs 0.511 — a wins. Check.
    assert(top(1L) == "a")
    assert(top(3L) == "c")
    // doc 4: a (df 3, idf ln(5/4)=0.223) vs d (df 1, idf ln(5/2)=0.916)
    assert(top(4L) == "d")
  }

  test("repetitionStats: duplicate fraction is exact") {
    val (nTok, nDis, dup) = CorpusStats.repetitionStats(col("text"))
    val m = corpus.select(col("doc_id"), nTok, nDis, dup).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((4L, 2L, 0.5)))
    assert(m(3L) == ((4L, 1L, 0.75)))
    assert(m(4L) == ((2L, 2L, 0.0)))
  }

  test("bigrams: adjacent pairs; sub-2-token texts yield empty, not error") {
    val bg = Seq((1L, "x y z"), (2L, "solo"), (3L, ""))
      .toDF("id", "text")
      .select(col("id"), CorpusStats.bigrams(col("text")).as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(bg(1L) == Seq("x y", "y z"))
    assert(bg(2L) == Seq.empty)
    assert(bg(3L) == Seq.empty)
  }

  test("topBigram: most frequent bigram with lexicographic tiebreak") {
    val df = Seq(
      (1L, "a b a b a"),   // "a b" x2, "b a" x2 -> tie, "a b" wins
      (2L, "q r s")        // all once -> "q r" (lexicographic)
    ).toDF("doc_id", "text")
    val m = CorpusStats.topBigram(df, col("text"), col("doc_id")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(1L) == (("a b", 2L, 0.5)))   // 2 of 4 bigram slots
    assert(m(2L) == (("q r", 1L, 0.5)))   // 1 of 2 slots
  }

  test("tokenEntropy: fixed-point result within 1e-4 of exact entropy") {
    val m = CorpusStats.tokenEntropy(toks).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def h(cs: Seq[Long]): Double = {
      val n = cs.sum.toDouble
      -cs.map(c => c / n * math.log(c / n)).sum
    }
    assert(m(1L)._1 == 4L)
    assert(math.abs(m(1L)._2 - h(Seq(3, 1))) < 1e-4)
    assert(m(3L)._2 == 0.0)                       // single token type
    assert(math.abs(m(4L)._2 - math.log(2)) < 1e-4)
  }

  test("bigram LM: hand-computed conditional log-probs; scores never positive") {
    // corpus bigrams: doc1 "a a","a a","a b"; doc2 "a b","b b","b c";
    // doc3 "c c"×3; doc4 "a d".
    // c(a a)=2 c(a b)=2 c(a d)=1 → c(a·)=5; c(b b)=1 c(b c)=1 → c(b·)=2;
    // c(c c)=3 → c(c·)=3.
    val out = CorpusStats.bigramLmScore(corpus, col("text"), col("doc_id"))
      .orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def fp(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    // doc3: 3 occurrences of "c c": score_fp = 3·(fp(3) − fp(3)) = 0
    assert(out(3L) == ((3L, 0L, 0.0)))
    // doc4: one "a d": fp(1) − fp(5) = −fp(5)
    assert(out(4L)._2 == -fp(5))
    // doc1: 2·(fp(2)−fp(5)) + (fp(2)−fp(5)) = 3·(fp(2)−fp(5))
    assert(out(1L)._2 == 3 * (fp(2) - fp(5)))
    // MLE log-probs are ≤ 0 always
    assert(out.values.forall(_._2 <= 0))
    // avg_nats = round(score_fp / (n_bg · 1e6), 4)
    val expAvg = BigDecimal(out(1L)._2.toDouble / (3 * 1e6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._3 == expAvg)
  }

  test("model scoring: unseen bigrams hit the OOV floor, never vanish or score as fluent") {
    // model trained on the base corpus; score a NEW doc with one seen
    // bigram ("a b") and one unseen ("z z") — the train-once/score-
    // often shape the model API exists for
    val model = CorpusStats.bigramLmModel(
      CorpusStats.docBigramCounts(corpus, col("text"), col("doc_id")))
    val fresh = Seq((10L, "a b"), (11L, "z z z")).toDF("doc_id", "text")
    val out = CorpusStats.bigramLmScoreWithModel(
        CorpusStats.docBigramCounts(fresh, col("text"), col("doc_id")), model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    // the fully-unseen doc must APPEAR, with every slot counted and
    // the floor score (an inner join dropped it entirely — or scored
    // partial-OOV docs as maximally fluent)
    assert(out.contains(11L), s"fully-OOV doc vanished: $out")
    assert(out(11L)._1 == 2L)                      // both "z z" slots counted
    assert(out(11L)._2 == -20.0)                   // the documented floor
    // the seen doc scores from the model as before
    def fp(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    assert(out(10L)._1 == 1L)
    assert(math.abs(out(10L)._2 - (fp(2) - fp(5)) / 1e6) < 1e-3)
  }

  test("plan: frequency/entropy aggregates are partial+final (map-side combine)") {
    for (df <- Seq(CorpusStats.tokenFrequencies(toks),
        CorpusStats.tokenEntropy(toks))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_"), s"no partial aggregate in:\n$plan")
    }
  }

  test("plan: repetition stats and bigrams stay row-local (no exchange below explode)") {
    val bg = corpus.select(col("doc_id"), explode(CorpusStats.bigrams(col("text"))))
    val plan = bg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("bm25Search matches an independent reference and ranks deterministically") {
    val counts = CorpusStats.docTokenCounts(toks)
    val lens = CorpusStats.docLengths(counts)
    val n = 4L
    val avgLen = (4 + 4 + 4 + 2) / 4.0
    val (k1, b) = (1.2, 0.75)
    // independent scalar reference over the collected fixture
    val byDoc = Map(
      1L -> Map("a" -> 3L, "b" -> 1L), 2L -> Map("a" -> 1L, "b" -> 2L, "c" -> 1L),
      3L -> Map("c" -> 4L), 4L -> Map("a" -> 1L, "d" -> 1L))
    val lenOf = Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 2L)
    def refScore(q: Seq[String], id: Long): Double = q.map { t =>
      val df = byDoc.values.count(_.contains(t))
      val c = byDoc(id).getOrElse(t, 0L).toDouble
      if (c == 0 || df == 0) 0.0
      else math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        c * (k1 + 1) / (c + k1 * (1 - b + b * lenOf(id) / avgLen))
    }.sum
    val q = Seq("a", "c")
    val got = CorpusStats.bm25Search(counts, lens, n, avgLen, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // only docs matching ≥1 query term appear, ranked score desc
    val expected = byDoc.keys.toSeq
      .map(id => (id, refScore(q, id)))
      .filter { case (id, _) => q.exists(byDoc(id).contains) }
      .sortBy { case (id, s) => (-s, id) }
    assert(got.map(_._1).toSeq == expected.map(_._1))
    got.zip(expected).foreach { case ((_, s, _), (_, e)) =>
      assert(math.abs(s - e) < 1e-9, s"$s vs $e")
    }
    // n_terms_matched counts distinct query terms present in the doc
    assert(got.find(_._1 == 2L).get._3 == 2L) // doc 2 has a and c
    // the final rank is top-k, not a total sort
    val plan = CorpusStats.bm25Search(counts, lens, n, avgLen, q, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("bm25SearchFp: fixed-point scores are the rounded double scores, same ranking") {
    val counts = CorpusStats.docTokenCounts(toks)
    val lens = CorpusStats.docLengths(counts)
    val (n, avgLen) = (4L, (4 + 4 + 4 + 2) / 4.0)
    val q = Seq("a", "c")
    val dbl = CorpusStats.bm25Search(counts, lens, n, avgLen, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val fp = CorpusStats.bm25SearchFp(counts, lens, n, avgLen, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same docs in the same order, same match counts
    assert(fp.map(_._1).toSeq == dbl.map(_._1).toSeq)
    assert(fp.map(_._3).toSeq == dbl.map(_._3).toSeq)
    // each fp score within one micro-unit per contributing term of the
    // double score (per-row rounding then exact integer sum)
    fp.zip(dbl).foreach { case ((_, sfp, nt), (_, sd, _)) =>
      assert(math.abs(sfp - sd * 1e6) <= nt.toDouble,
        s"fp=$sfp double=${sd * 1e6} terms=$nt")
    }
    // fixed-point plan is still top-k
    val plan = CorpusStats.bm25SearchFp(counts, lens, n, avgLen, q, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }
  test("phraseOccurrences: adjacency joins, overlap counts, repeated terms, n-term phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "full table scan beats index when selective"),
      (2L, "table scan table scan"),             // two non-overlapping
      (3L, "a a a"),                             // overlap fixture
      (4L, "scan table"),                        // reversed - no match
      (5L, "table only here")
    ).toDF("doc_id", "text")
    def occ(phrase: String*) =
      CorpusStats.phraseOccurrences(docs, col("text"), col("doc_id"), phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(occ("table", "scan") == Map(1L -> 1L, 2L -> 2L))
    // overlapping occurrences each count: "a a a" has starts 0 and 1
    assert(occ("a", "a") == Map(3L -> 2L))
    // 3-term phrase chains the join
    assert(occ("table", "scan", "table") == Map(2L -> 1L))
    // the postings fetch shape: the exploded frame is filtered to the
    // phrase terms BEFORE any join (a Filter with tok IN (...) below
    // the joins), never a full-postings join
    val plan = CorpusStats.phraseOccurrences(docs, col("text"),
      col("doc_id"), Seq("table", "scan")).queryExecution.executedPlan.toString
    assert(plan.contains("tok"), plan.take(1500))
  }

}
