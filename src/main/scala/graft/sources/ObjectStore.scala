package graft.sources

import org.apache.spark.sql.SparkSession

/** Object-store wiring — SURVEY §2.1 S3: the reference configures
  * DuckDB httpfs for MinIO (endpoint, path-style addressing,
  * credentials from env — /root/reference/airflow/dags/
  * fetch_stocks.py:131-141, streamlit/app.py:23-36). The Spark-native
  * equivalent is the `s3a://` filesystem with the same four settings
  * on the Hadoop configuration; every `spark.read`/`df.write` against
  * an `s3a://` URI then goes through it — scans, landing appends and
  * star-schema parquet publishes alike.
  *
  * No credentials are stored here: like the reference, they come from
  * the environment at configure time.
  */
/** Object-store-STYLE Hadoop filesystem under the `graftos://`
  * scheme: RawLocalFileSystem re-rooted onto a registered non-default
  * scheme, so every FS call a scan makes — open, listStatus, glob,
  * block locations — resolves through the scheme→impl binding exactly
  * the way `s3a://` does against a real store, instead of silently
  * short-circuiting through the default `file:` filesystem. This is
  * what q_objectstore_scan's oracle row certifies (r14 verdict #5):
  * a DuckDB-hashed read through a registered FS boundary. The
  * spec-side twin (S3StyleLoopSpec's `grafts3://`) exercises the
  * write/landing loop; the two schemes are kept distinct so the
  * Hadoop FileSystem cache never serves one binding for the other. */
class ObjectStoreStyleFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftos"
  override def getUri: java.net.URI = java.net.URI.create("graftos:///")
}

object ObjectStore {

  /** The three classes the zero-rename commit path needs at runtime:
    * the factory Hadoop resolves for `s3a://` output (hadoop-aws) and
    * the Spark-side protocol/committer bindings (spark-hadoop-cloud). */
  val CommitterFactoryClass = "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
  val CommitProtocolClass = "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
  val ParquetCommitterClass = "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"

  /** True when the whole zero-rename stack is on the classpath. */
  def magicCommitterAvailable: Boolean =
    Seq(CommitterFactoryClass, CommitProtocolClass, ParquetCommitterClass)
      .forall { cn =>
        try { Class.forName(cn, false, getClass.getClassLoader); true }
        catch { case _: ClassNotFoundException => false }
      }

  /** Point `s3a://` at an S3-compatible endpoint (MinIO-style:
    * path-style access, static credentials). Mirrors the reference's
    * httpfs block 1:1.
    *
    * Committer: `fs.s3a.committer.name=magic` alone is INERT — Hadoop
    * only consults it once the S3A committer factory is bound to the
    * `s3a` scheme and Spark's commit protocol is the PathOutput
    * bridge, so without those a real object store silently falls back
    * to rename commits (O(data) copies + a non-atomic window). This
    * sets the full stack: magic.enabled + the factory scheme binding
    * always (they are plain Hadoop conf), and the two Spark-side
    * classes only when they are actually loadable — pointing Spark at
    * an absent class would break every parquet write in the session.
    *
    * @return true when the zero-rename stack is fully installed;
    *         false = endpoint config landed but commits will rename
    *         (hadoop-aws / spark-hadoop-cloud not deployed — callers
    *         targeting a REAL object store should treat false as a
    *         deployment error, not a soft degrade) */
  def configureS3(spark: SparkSession, endpoint: String,
      accessKey: String, secretKey: String,
      pathStyle: Boolean = true, ssl: Boolean = false): Boolean = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.endpoint", endpoint)
    c.set("fs.s3a.access.key", accessKey)
    c.set("fs.s3a.secret.key", secretKey)
    c.set("fs.s3a.path.style.access", pathStyle.toString)
    c.set("fs.s3a.connection.ssl.enabled", ssl.toString)
    // deterministic zero-rename committer for object stores
    c.set("fs.s3a.committer.name", "magic")
    c.set("fs.s3a.committer.magic.enabled", "true")
    c.set("mapreduce.outputcommitter.factory.scheme.s3a", CommitterFactoryClass)
    val ready = magicCommitterAvailable
    if (ready) {
      spark.conf.set("spark.sql.sources.commitProtocolClass", CommitProtocolClass)
      spark.conf.set("spark.sql.parquet.output.committer.class", ParquetCommitterClass)
    }
    ready
  }

  /** Configure from environment, the reference's convention
    * (fetch_stocks.py:131-141 reads endpoint + keys from env vars).
    * Returns false (and leaves the session untouched) when the
    * variables are absent — local `file://` testdata needs nothing —
    * and PROPAGATES [[configureS3]]'s committer-readiness when they
    * are present: true means "configured AND zero-rename commits
    * active". The env-driven path is exactly the real-object-store
    * deployment, so swallowing a false here would hide the non-atomic
    * O(data) rename-commit fallback configureS3's doc calls a
    * deployment error. */
  def configureS3FromEnv(spark: SparkSession,
      endpointVar: String = "S3_ENDPOINT",
      accessVar: String = "S3_ACCESS_KEY",
      secretVar: String = "S3_SECRET_KEY"): Boolean = {
    (sys.env.get(endpointVar), sys.env.get(accessVar), sys.env.get(secretVar)) match {
      case (Some(e), Some(a), Some(s)) => configureS3(spark, e, a, s)
      case _ => false
    }
  }

  /** Landing-object URI for a daily append (the reference's
    * `{prefix}:{date}.csv` naming; ':' is path-illegal on Hadoop so
    * the engine convention is '_' — same watermark semantics, see
    * graft.etl.StarSchemaBuilder.lastSavedDate). */
  def landingUri(bucket: String, prefix: String, date: java.time.LocalDate): String =
    s"s3a://$bucket/${prefix}_$date.csv"
}
