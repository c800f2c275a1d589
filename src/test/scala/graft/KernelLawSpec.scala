package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FreqItemsAgg, MinHashAgg, TopKAgg}

/** Merge-law properties of the typed aggregate kernels, driven at the
  * raw buffer level (update/merge/eval/serialize) over generated
  * inputs and RANDOM MERGE TREES — the algebra the 100 TB story rests
  * on: Spark may split a group across any number of partitions, merge
  * partials in any association, and ship buffers through serde at any
  * point, so the kernels must be invariant to all three.
  *
  *  - TopKAgg / MinHashAgg: eval after any split/merge-tree/serde
  *    equals the sequential fold EXACTLY (true monoids).
  *  - FreqItemsAgg: Misra-Gries merged state is NOT canonical (the
  *    merge tree may change which counters survive), so the law is
  *    the published envelope: est ≤ true, undercount ≤ n/(capacity+1),
  *    and every item above the threshold is present — under every
  *    random split and tree.
  *
  * Fixed seeds keep runs reproducible (SURVEY §5.2 item 3).
  */
class KernelLawSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Split `xs` into `n` contiguous chunks (some possibly empty). */
  private def split[A](xs: List[A], cuts: List[Int]): List[List[A]] = {
    val bounds = (0 :: cuts.map(c => math.abs(c) % (xs.length + 1)).sorted)
      .:+(xs.length)
    bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
  }

  /** Fold buffers pairwise in a seeded random order (a random merge
    * tree), optionally bouncing each operand through serde first. */
  private def mergeTree[B](
      agg: org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[B],
      bufs: List[B], seed: Long, serde: Boolean): B = {
    val rnd = new scala.util.Random(seed)
    var pool = rnd.shuffle(bufs)
    while (pool.length > 1) {
      val a :: b :: rest = pool: @unchecked
      val bb = if (serde) agg.deserialize(agg.serialize(b)) else b
      pool = rnd.shuffle(agg.merge(a, bb) :: rest)
    }
    pool.head
  }

  // ---- TopKAgg ----------------------------------------------------

  private val topk = TopKAgg(
    BoundReference(0, DoubleType, nullable = true),
    BoundReference(1, LongType, nullable = true), k = 5)

  private def topkEval(rows: List[(Double, Long)], chunks: List[Int],
      seed: Long): Seq[(Long, Double)] = {
    val bufs = split(rows, chunks).map { part =>
      part.foldLeft(topk.createAggregationBuffer()) { (b, r) =>
        topk.update(b, InternalRow(r._1, r._2))
      }
    }
    val arr = topk.eval(mergeTree(topk, bufs, seed, serde = true))
      .asInstanceOf[GenericArrayData]
    (0 until arr.numElements()).map { i =>
      val s = arr.getStruct(i, 2); (s.getLong(0), s.getDouble(1))
    }
  }

  test("TopKAgg: any split + random merge tree + serde equals the sorted reference") {
    val gen = for {
      rows <- Gen.listOf(Gen.zip(
        Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 30L)))
      cuts <- Gen.listOfN(4, Gen.chooseNum(0, 1000))
    } yield (rows, cuts)
    for (seed <- 1L to 50L) {
      val (rows, cuts) = sample(gen, seed)
      // the kernel's contract: rank by (score DESC, id ASC), exact
      // duplicates collapse (same logical row)
      val ref = rows.distinct
        .sortBy { case (s, i) => (-s, i) }.take(5)
        .map { case (s, i) => (i, s) }
      assert(topkEval(rows, cuts, seed) == ref, s"seed=$seed")
    }
  }

  // ---- TopKPairAgg ------------------------------------------------

  private val topkp = graft.functions.TopKPairAgg(
    BoundReference(0, DoubleType, nullable = true),
    BoundReference(1, LongType, nullable = true),
    BoundReference(2, LongType, nullable = true), k = 5)

  private def topkpEval(rows: List[(Double, Long, Long)], chunks: List[Int],
      seed: Long): Seq[(Long, Long, Double)] = {
    val bufs = split(rows, chunks).map { part =>
      part.foldLeft(topkp.createAggregationBuffer()) { (b, r) =>
        topkp.update(b, InternalRow(r._1, r._2, r._3))
      }
    }
    val arr = topkp.eval(mergeTree(topkp, bufs, seed, serde = true))
      .asInstanceOf[GenericArrayData]
    (0 until arr.numElements()).map { i =>
      val s = arr.getStruct(i, 3); (s.getLong(0), s.getLong(1), s.getDouble(2))
    }
  }

  test("TopKPairAgg: any split + random merge tree + serde equals the sorted reference") {
    val gen = for {
      rows <- Gen.listOf(Gen.zip(
        Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 12L)))
      cuts <- Gen.listOfN(4, Gen.chooseNum(0, 1000))
    } yield (rows, cuts)
    for (seed <- 1L to 50L) {
      val (rows, cuts) = sample(gen, seed)
      // rank by (score DESC, id1 ASC, id2 ASC); exact duplicates
      // collapse (same logical pair row)
      val ref = rows.distinct
        .sortBy { case (s, a, b) => (-s, a, b) }.take(5)
        .map { case (s, a, b) => (a, b, s) }
      assert(topkpEval(rows, cuts, seed) == ref, s"seed=$seed")
    }
  }

  // ---- MinHashAgg -------------------------------------------------

  private val mh = MinHashAgg(
    BoundReference(0, StringType, nullable = true), numHashes = 8)

  private def mhBufs(parts: List[List[String]]): List[Array[Array[Byte]]] =
    parts.map { part =>
      part.foldLeft(mh.createAggregationBuffer()) { (b, s) =>
        mh.update(b, InternalRow(UTF8String.fromString(s)))
      }
    }

  private def mhShow(a: Any): Seq[String] = {
    val arr = a.asInstanceOf[GenericArrayData]
    (0 until arr.numElements()).map(i => String.valueOf(arr.get(i, StringType)))
  }

  test("MinHashAgg: any split + random merge tree + serde equals the sequential fold") {
    val gen = for {
      vals <- Gen.nonEmptyListOf(Gen.identifier.map(_.take(12)))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, 1000))
    } yield (vals, cuts)
    for (seed <- 1L to 50L) {
      val (vals, cuts) = sample(gen, seed)
      val seq = mhShow(mh.eval(mhBufs(List(vals)).head))
      val forest = mhShow(mh.eval(
        mergeTree(mh, mhBufs(split(vals, cuts)), seed, serde = true)))
      assert(forest == seq, s"seed=$seed")
    }
  }

  // ---- FreqItemsAgg -----------------------------------------------

  test("FreqItemsAgg: envelope holds under every random split and merge tree") {
    val cap = 8
    val fi = FreqItemsAgg(
      BoundReference(0, StringType, nullable = true), capacity = cap)
    // skewed vocabulary larger than capacity so eviction really runs
    val gen = for {
      vals <- Gen.nonEmptyListOf(Gen.frequency(
        5 -> Gen.const("hot1"), 3 -> Gen.const("hot2"),
        2 -> Gen.oneOf((1 to 40).map(i => s"cold$i"))))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, 1000))
    } yield (vals, cuts)
    for (seed <- 1L to 50L) {
      val (vals, cuts) = sample(gen, seed)
      val bufs = split(vals, cuts).map { part =>
        part.foldLeft(fi.createAggregationBuffer()) { (b, s) =>
          fi.update(b, InternalRow(UTF8String.fromString(s)))
        }
      }
      val merged = mergeTree(fi, bufs, seed, serde = true)
      val arr = fi.eval(merged).asInstanceOf[GenericArrayData]
      val est = (0 until arr.numElements()).map { i =>
        val s = arr.getStruct(i, 2)
        s.getUTF8String(0).toString -> s.getLong(1)
      }.toMap
      val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = vals.length.toLong / (cap + 1)
      for ((item, e) <- est) {
        val t = truth(item)
        assert(e <= t && e >= t - slack, s"seed=$seed $item est=$e true=$t")
      }
      // no false negatives above the threshold
      for ((item, t) <- truth if t > slack)
        assert(est.contains(item), s"seed=$seed missing $item (true=$t)")
    }
  }

  // -------------------------------------------------------------
  // Scalar kernels: the INTERPRETED eval path (nullSafeEval — what a
  // CodegenFallback context or a driver-side fold would run) must
  // equal the codegen path the DataFrame queries exercise. Driven at
  // the raw InternalRow level over generated vectors.
  // -------------------------------------------------------------

  test("QuantizedDot: interpreted eval equals the codegen DataFrame result") {
    import org.apache.spark.sql.functions.{array, col, lit}
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val planeVals = Seq.tabulate(64)(i =>
      (if (i % 3 == 0) -1 else 1) * rnd.nextInt(1 << 23).toDouble)
    val vecs = (0 until 60).map(_ => Seq.tabulate(64)(_ =>
      rnd.nextInt(5) match {
        case 0 => (rnd.nextInt(4001) - 2000 + 0.5) / 1000000.0
        case 1 => rnd.nextGaussian() * 50
        case _ => rnd.nextDouble() * 2 - 1
      }))
    val expr = graft.functions.QuantizedDot(
      BoundReference(0,
        org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false),
        nullable = true),
      BoundReference(1,
        org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false),
        nullable = true))
    val planeData = new GenericArrayData(planeVals.toArray)
    val interpreted = vecs.map(v =>
      expr.eval(InternalRow(new GenericArrayData(v.toArray), planeData)))
    val codegen = vecs.zipWithIndex.map(_.swap).toDF("i", "v")
      .orderBy("i")
      .select(graft.functions.GraftFunctions.quantizedDot(
        col("v"), array(planeVals.map(lit): _*)).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(interpreted == codegen)
  }

  test("SimHashSign: interpreted eval equals the codegen DataFrame result") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val hexDigits = "0123456789abcdef"
    val rows = (0 until 60).map(_ =>
      (1 to 1 + rnd.nextInt(40)).map(_ =>
        Seq.fill(16)(hexDigits(rnd.nextInt(16))).mkString))
    val expr = graft.functions.SimHashSign(
      BoundReference(0,
        org.apache.spark.sql.types.ArrayType(StringType, containsNull = false),
        nullable = true),
      nBits = 64)
    val interpreted = rows.map(hx => expr.eval(InternalRow(
      new GenericArrayData(hx.map(UTF8String.fromString).toArray))).toString)
    val codegen = rows.zipWithIndex.map(_.swap).toDF("i", "hx")
      .orderBy("i")
      .select(graft.functions.GraftFunctions.simHashSign(col("hx"), 64).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(interpreted == codegen)
  }

  test("TokenStats: kernel equals the declarative split family byte-for-byte") {
    // the spec's own chunking helper is also named `split` — rename
    // the SQL function on import
    import org.apache.spark.sql.functions.{split => sqlSplit, _}
    val spark = TestSpark.spark
    import spark.implicits._
    val stop = Seq("a", "the")
    // adversarial fixture: empty string (one empty token), lone and
    // repeated spaces (empty tokens count and dedup), leading/trailing
    // spaces, multi-byte chars (char_len != byte len), stopwords at
    // every position, duplicate tokens, null text
    val texts: Seq[String] = Seq(
      "", " ", "  ", "a", "the", "a the a", " a", "the ", "a  the",
      "über ältere straße über", "naïve café naïve café a",
      "x y z x y z the the the a a", "one", "one two", "αβγ δε αβγ",
      null) ++ (0 until 40).map { i =>
      val rnd = new scala.util.Random(100 + i)
      (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(6) match {
        case 0 => "a"
        case 1 => "the"
        case 2 => ""
        case 3 => "tok" + rnd.nextInt(8)
        case _ => "wörd" + rnd.nextInt(4)
      }).mkString(" ")
    }
    val df = texts.zipWithIndex.map(_.swap).toDF("i", "text").orderBy("i")
    val st = graft.functions.GraftFunctions.tokenStats(col("text"), stop)
    val w = sqlSplit(col("text"), " ")
    val rows = df.select(
      st.getField("n_tokens").as("k_tok"),
      st.getField("n_distinct").as("k_dis"),
      st.getField("stopword_hits").as("k_stop"),
      st.getField("char_len").as("k_len"),
      size(w).cast("long").as("d_tok"),
      size(array_distinct(w)).cast("long").as("d_dis"),
      expr("size(filter(split(text, ' '), x -> x IN ('a', 'the')))")
        .cast("long").as("d_stop"),
      length(col("text")).cast("long").as("d_len")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      if (t == null) assert((0 until 8).forall(r.isNullAt), s"null text: $r")
      else {
        assert(r.getLong(0) == r.getLong(4), s"n_tokens on '$t': $r")
        assert(r.getLong(1) == r.getLong(5), s"n_distinct on '$t': $r")
        assert(r.getLong(2) == r.getLong(6), s"stopword_hits on '$t': $r")
        assert(r.getLong(3) == r.getLong(7), s"char_len on '$t': $r")
      }
    }
  }

  test("TokenStats: interpreted eval equals the codegen DataFrame result") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val texts = (0 until 60).map(_ =>
      (0 until rnd.nextInt(25)).map(_ => rnd.nextInt(5) match {
        case 0 => "the"
        case 1 => ""
        case _ => "w" + rnd.nextInt(10)
      }).mkString(" "))
    val expr0 = graft.functions.TokenStats(
      BoundReference(0, StringType, nullable = true), Seq("the"))
    val interpreted = texts.map(t =>
      expr0.eval(InternalRow(UTF8String.fromString(t)))
        .asInstanceOf[InternalRow]).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val st = graft.functions.GraftFunctions.tokenStats(col("text"), Seq("the"))
    val codegen = texts.zipWithIndex.map(_.swap).toDF("i", "text")
      .orderBy("i")
      .select(st.getField("n_tokens"), st.getField("n_distinct"),
        st.getField("stopword_hits"), st.getField("char_len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(interpreted == codegen)
  }
}
