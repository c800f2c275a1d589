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
}
