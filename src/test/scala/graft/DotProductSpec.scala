package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.DotProduct: the codegen'd kernel must agree bitwise
  * with the higher-order-function formulation it replaced (zip_with +
  * aggregate, strict left-to-right summation), including on the real
  * embeddings fixture used by q_dedup_embed_topk / q_ann_topk.
  */
class DotProductSpec extends AnyFunSuite {
  import TestSpark._

  test("matches the HOF zip_with+aggregate sum bitwise on fixtures") {
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = e.select(expr("graft_dot(v, v)").as("fast"), hof.as("slow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cross-vector dot matches HOF on pairs; null array yields null") {
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.toDF("id1", "v1")
    val b = e.toDF("id2", "v2")
    val hof = aggregate(zip_with(col("v1"), col("v2"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = a.join(b, col("id1") < col("id2"))
      .select(expr("graft_dot(v1, v2)").as("fast"), hof.as("slow"))
      .collect()
    assert(rows.length == 190)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }

    val withNull = e.withColumn("v",
      when(col("vec_id") === 0, lit(null).cast("array<double>")).otherwise(col("v")))
    val got = withNull.select(col("vec_id"), expr("graft_dot(v, v)").as("d"))
      .orderBy("vec_id").collect()
    assert(got.head.isNullAt(1))
    assert(got.tail.forall(!_.isNullAt(1)))
  }

  test("mismatched lengths yield null (zip_with pad semantics)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val fused = df.select(expr("graft_dot(a, b)")).head()
    assert(fused.isNullAt(0))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).head()
    assert(hof.isNullAt(0), "HOF reference must agree")
  }

  test("cosine on non-nullable arrays compiles (3 kernels, one codegen unit)") {
    // array(lit...) columns are non-nullable: nullSafeCodeGen inlines
    // all three DotProduct bodies into one function — fresh variable
    // names must prevent declaration collisions.
    val df = spark.range(5).select(
      array(lit(1.0), lit(2.0), lit(3.0)).as("a"),
      array(lit(4.0), lit(5.0), lit(6.0)).as("b"))
    val out = df.select(graft.functions.GraftFunctions.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(out.length == 5)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    out.foreach(v => assert(math.abs(v - expected) < 1e-12))
  }

  test("non-array input fails at analysis time, not runtime") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1, 2, 3), Seq(4, 5, 6))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(expr("graft_dot(a, b)")).collect()
    }
    assert(e.getMessage.contains("ARRAY<DOUBLE>") || e.getMessage.contains("DATATYPE"),
      e.getMessage)
  }

  test("interpreted eval path (codegen off) agrees with codegen") {
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val on = e.select(expr("graft_dot(v, v)")).collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val off = e.select(expr("graft_dot(v, v)")).collect().map(_.getDouble(0))
      assert(on.toSeq == off.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
