package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** graft.GraftExtensions — a session built with the extension resolves
  * graft_dot in SQL with no imperative registration. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves graft_dot in SQL") {
    TestSpark.spark // ensure the shared context exists first
    val s: SparkSession = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .create()
    // NB: no s.stop() — SparkSession.stop() stops the underlying
    // SparkContext, which is shared with every other suite in this JVM.
    // The extra session state is dropped with the JVM.
    val v = s.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(v == 32.0)
  }

  test("extension session resolves the scalar and aggregate kernels in SQL") {
    TestSpark.spark
    val s: SparkSession = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .create()
    val rh = s.sql("SELECT graft_rolling_hash('abc') AS h").head().getLong(0)
    assert(rh > 0)
    // graft_top_k in a GROUP BY: top-2 by (score desc, id asc)
    val topk = s.sql(
      """SELECT g, graft_top_k(score, id, 2) AS top FROM VALUES
        |  ('a', 1.0d, 1L), ('a', 3.0d, 2L), ('a', 2.0d, 3L),
        |  ('b', 5.0d, 4L) AS t(g, score, id)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val aTop = topk(0).getSeq[org.apache.spark.sql.Row](1).map(r => r.getLong(0))
    assert(aTop == Seq(2L, 3L))
    // graft_freq_items: exact counts while capacity holds
    val fi = s.sql(
      """SELECT graft_freq_items(x, 8) AS items FROM VALUES
        |  ('p'), ('p'), ('q') AS t(x)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(fi.map(r => (r.getString(0), r.getLong(1))) == Seq(("p", 2L), ("q", 1L)))
  }

  test("SQL aggregates coerce non-canonical input types at analysis") {
    TestSpark.spark
    val s: SparkSession = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .create()
    // DECIMAL score + INT id — pre-ImplicitCastInputTypes this threw
    // ClassCastException at execution (raw eval().asInstanceOf)
    val top = s.sql(
      """SELECT graft_top_k(CAST(score AS DECIMAL(10,2)), id, 2) AS top
        |FROM VALUES (1.50, 1), (3.25, 2), (2.00, 3) AS t(score, id)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getLong(0)) == Seq(2L, 3L))
    assert(top.map(_.getDouble(1)) == Seq(3.25, 2.0))
    // INT input to the string sketch casts to its string form
    val fi2 = s.sql(
      "SELECT graft_freq_items(x, 8) AS items FROM VALUES (7), (7), (9) AS t(x)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(fi2.map(r => (r.getString(0), r.getLong(1))) == Seq(("7", 2L), ("9", 1L)))
  }

  test("both registration paths serve the complete sqlKernels catalog") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.functions.{array, expr, lit, md5}
    TestSpark.spark
    val ext: SparkSession = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .create()
    val imp = TestSpark.spark.newSession()
    graft.functions.GraftFunctions.register(imp)
    // completeness: ONE catalog, both paths — a kernel added to
    // sqlKernels is SQL-callable everywhere, a kernel added anywhere
    // else fails here (the pre-r11 drift: the extension path lacked
    // graft_quantized_dot/graft_top_k_pairs, and the r10/r11 kernels
    // were SQL-callable from neither path)
    for ((name, _, _) <- graft.functions.GraftFunctions.sqlKernels) {
      assert(ext.sessionState.functionRegistry.functionExists(
        FunctionIdentifier(name)), s"extension session missing $name")
      assert(imp.sessionState.functionRegistry.functionExists(
        FunctionIdentifier(name)), s"imperative register missing $name")
    }
    // value probes for the members the old extension list lacked
    val qd = ext.range(1).select(
      expr("graft_quantized_dot(array(0.5d), array(1.0d))").as("a"),
      graft.functions.GraftFunctions.quantizedDot(
        array(lit(0.5)), array(lit(1.0))).as("b")).head()
    assert(qd.getLong(0) == qd.getLong(1) && qd.getLong(0) != 0L)
    val pairs = ext.sql(
      """SELECT graft_top_k_pairs(s, a, b, 1) FROM VALUES
        |  (0.9d, 1L, 2L), (0.5d, 1L, 3L) AS t(s, a, b)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
    // r10/r11 kernels: SQL form ≡ Column API form on the same row
    val par = ext.range(1).select(
      expr("graft_simhash_sign(array(md5('x')), 8)").as("sSql"),
      graft.functions.GraftFunctions.simHashSign(
        array(md5(lit("x"))), 8).as("sCol"),
      expr("graft_minhash_minima(array('a b', 'b c'), 4)").as("mSql"),
      graft.functions.GraftFunctions.minHashMinima(
        array(lit("a b"), lit("b c")), 4).as("mCol")).head()
    assert(par.getString(0) == par.getString(1) && par.getString(0).length == 8)
    assert(par.getSeq[Long](2) == par.getSeq[Long](3))
    assert(ext.sql("SELECT graft_shingle_windows(array('a', 'b', 'c'), 2)")
      .head().getSeq[String](0) == Seq("a b", "b c"))
    val ts = ext.sql(
      "SELECT graft_token_stats('a the b', array('the')) AS st").select(
      "st.n_tokens", "st.n_distinct", "st.stopword_hits", "st.char_len").head()
    assert((ts.getLong(0), ts.getLong(1), ts.getLong(2), ts.getLong(3)) ==
      ((3L, 3L, 1L, 7L)))
  }

  test("imperative register exposes the full native surface in SQL") {
    val s = TestSpark.spark.newSession()
    graft.functions.GraftFunctions.register(s)
    // one probe per function — same names the extensions path serves
    assert(s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) == 11.0)
    assert(s.sql("SELECT graft_rolling_hash('ab')").head().getLong(0) ==
      ('a'.toInt * 31 + 'b'.toInt).toLong)
    assert(s.sql("SELECT graft_token_window_hash('a b c', 2)")
      .head().getSeq[Long](0).length == 2)
    assert(s.sql(
      "SELECT graft_top_k(score, id, 1) FROM VALUES (1.0d, 1L), (2.0d, 2L) AS t(score, id)")
      .head().getSeq[org.apache.spark.sql.Row](0).head.getLong(0) == 2L)
    assert(s.sql(
      "SELECT graft_freq_items(x, 4) FROM VALUES ('a'), ('a'), ('b') AS t(x)")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
  }
}
