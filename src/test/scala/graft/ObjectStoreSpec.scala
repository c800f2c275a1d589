package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.sources.ObjectStore — configuration lands on the Hadoop conf
  * (the s3a path every s3a:// read/write takes); env-absent is a
  * clean no-op. */
class ObjectStoreSpec extends AnyFunSuite {
  import TestSpark._

  test("configureS3 sets the four s3a settings") {
    sources.ObjectStore.configureS3(spark, "http://localhost:9000", "ak", "sk")
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(c.get("fs.s3a.access.key") == "ak")
    assert(c.get("fs.s3a.secret.key") == "sk")
    assert(c.get("fs.s3a.path.style.access") == "true")
  }

  test("configureS3FromEnv is a no-op without the variables") {
    assert(!sources.ObjectStore.configureS3FromEnv(spark, "GRAFT_NO_SUCH_VAR",
      "GRAFT_NO_SUCH_VAR2", "GRAFT_NO_SUCH_VAR3"))
  }

  test("landing URI follows the watermark naming convention") {
    val uri = sources.ObjectStore.landingUri("p20", "stocks",
      java.time.LocalDate.of(2024, 3, 9))
    assert(uri == "s3a://p20/stocks_2024-03-09.csv")
  }
}
