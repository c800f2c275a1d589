package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [onlyCsv] — the optional third arg
    // restricts the dump to named queries for fast local iteration;
    // the driver always passes exactly two.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    // A typo'd name would otherwise match nothing and dump zero queries
    // with exit 0 — the same silent-failure class the writeBloom schema
    // guard exists to prevent.
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Write micros (not INT96) so the driver's parquet reader sees the
      // same physical timestamp type DuckDB produces.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet carries TIMESTAMP(NANOS): read as long, converted
      // to micro timestamps in graft.queries.t().
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // sort-based shuffle writer: see Bench.scala — 3.5× less per-
      // stage filesystem overhead than the ≤200-partition bypass path
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      // Same A/B knob as Bench (r19, r18-verdict #5): default lz4 =
      // Spark's default, so the driver's dump is byte-identical to
      // before; non-default lets a zstd gate run prove the production
      // codec candidate END-TO-END (oracle burnin over results
      // computed under zstd shuffle), not just time it.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // one retry: the queries are deterministic, so a second failure
      // is a real bug, but a transient executor/broadcast hiccup (this
      // VM shows them) must not zero the query's correctness record
      def attempt(): Unit = fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      // NonFatal only: re-running an identical plan on an OOM'd/
      // corrupted JVM doubles the damage — fatal errors propagate
      import scala.util.control.NonFatal
      try attempt()
      catch { case NonFatal(e1) =>
        System.err.println(s"[verify] $name attempt 1 failed: " +
          s"${e1.getClass.getName}: ${e1.getMessage} — retrying")
        try attempt()
        catch { case NonFatal(e2) =>
          System.err.println(s"[verify] $name failed: " +
            s"${e2.getClass.getName}: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Keep the manifest consistent with the dumped parquet set: a
    // filtered run must not emit a full manifest whose unlisted entries
    // read as missing results to the driver's compare.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
