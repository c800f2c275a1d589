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

  test("magic committer stack is fully configured, never half-set") {
    val ready = sources.ObjectStore.configureS3(spark, "http://localhost:9000", "ak", "sk")
    val c = spark.sparkContext.hadoopConfiguration
    // committer.name=magic alone is inert: the enable flag and the
    // factory scheme binding must land with it
    assert(c.get("fs.s3a.committer.name") == "magic")
    assert(c.get("fs.s3a.committer.magic.enabled") == "true")
    assert(c.get("mapreduce.outputcommitter.factory.scheme.s3a") ==
      sources.ObjectStore.CommitterFactoryClass)
    // this container ships no hadoop-aws/spark-hadoop-cloud jars, so
    // the Spark-side protocol must NOT be pointed at unloadable
    // classes (that would break every parquet write) and the caller
    // must be told the zero-rename path is absent
    assert(ready == sources.ObjectStore.magicCommitterAvailable)
    if (!ready) {
      assert(spark.conf.getOption("spark.sql.sources.commitProtocolClass").isEmpty ||
        spark.conf.get("spark.sql.sources.commitProtocolClass") !=
          sources.ObjectStore.CommitProtocolClass)
    }
  }

  test("factory scheme binding is the key Hadoop actually consults") {
    // prove the mechanism with a factory class that exists in this
    // container: bind it for a scheme and resolve through the same
    // PathOutputCommitterFactory lookup that s3a output takes — a
    // typo'd key would silently fall back to the default factory
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.mapreduce.lib.output.PathOutputCommitterFactory
    val conf = new Configuration(false)
    conf.set("mapreduce.outputcommitter.factory.scheme.file",
      "org.apache.hadoop.mapreduce.lib.output.NamedCommitterFactory")
    val f = PathOutputCommitterFactory.getCommitterFactory(
      new Path("file:///tmp/graft-committer-probe"), conf)
    assert(f.getClass.getName ==
      "org.apache.hadoop.mapreduce.lib.output.NamedCommitterFactory")
    // an UNbound scheme falls back to the default (file) factory —
    // i.e. the scheme suffix in the key is what selects
    val g = PathOutputCommitterFactory.getCommitterFactory(
      new Path("other:///tmp/x"), conf)
    assert(g.getClass.getName ==
      "org.apache.hadoop.mapreduce.lib.output.FileOutputCommitterFactory")
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
