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
object ObjectStore {

  /** Point `s3a://` at an S3-compatible endpoint (MinIO-style:
    * path-style access, static credentials). Mirrors the reference's
    * httpfs block 1:1. */
  def configureS3(spark: SparkSession, endpoint: String,
      accessKey: String, secretKey: String,
      pathStyle: Boolean = true, ssl: Boolean = false): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.endpoint", endpoint)
    c.set("fs.s3a.access.key", accessKey)
    c.set("fs.s3a.secret.key", secretKey)
    c.set("fs.s3a.path.style.access", pathStyle.toString)
    c.set("fs.s3a.connection.ssl.enabled", ssl.toString)
    // deterministic committer behavior for object stores (no rename)
    c.set("fs.s3a.committer.name", "magic")
  }

  /** Configure from environment, the reference's convention
    * (fetch_stocks.py:131-141 reads endpoint + keys from env vars).
    * Returns false (and leaves the session untouched) when the
    * variables are absent — local `file://` testdata needs nothing. */
  def configureS3FromEnv(spark: SparkSession,
      endpointVar: String = "S3_ENDPOINT",
      accessVar: String = "S3_ACCESS_KEY",
      secretVar: String = "S3_SECRET_KEY"): Boolean = {
    (sys.env.get(endpointVar), sys.env.get(accessVar), sys.env.get(secretVar)) match {
      case (Some(e), Some(a), Some(s)) => configureS3(spark, e, a, s); true
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
