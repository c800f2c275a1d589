package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Shared plumbing for the declared query inventory (SURVEY.md §2.11).
  *
  * Every declared query is implemented twice: as a Spark DataFrame plan
  * here, and as DuckDB SQL (the driver's oracle) in the same category
  * object. Oracle SQL references the tables by bare name (`lineitem`,
  * `orders`, …) per the driver contract example in SparkEntry's scaladoc;
  * the driver materializes each `{sfDir}/<table>.parquet` under that name.
  *
  * Determinism rules (SURVEY.md §7.3) applied throughout:
  *  - every query ends with ORDER BY over a unique key combination;
  *  - order-dependent double reductions go through exact DECIMAL(18,4)
  *    sums (the testdata's doubles carry ≤2 decimal places, so the
  *    double→decimal cast is exact on both engines);
  *  - per-row double arithmetic is left unrounded (bit-identical IEEE
  *    ops on both sides); only genuinely divergent reductions
  *    (cosine dot product) are rounded to 4 dp;
  *  - derived integer outputs are cast to BIGINT on both sides (DuckDB
  *    year()/rank()/length() return BIGINT where Spark returns INT).
  */
package object queries {
  /** Signature the driver invokes: (session, sfDir) => result. */
  type QFn = (SparkSession, String) => DataFrame

  /** Load one driver-generated parquet table.
    *
    * `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright (DuckDB silently truncates it to micros).
    * With `spark.sql.legacy.parquet.nanosAsLong=true` the column reads
    * as a LongType nanosecond count; convert it here to a micro
    * timestamp via integral division — matching DuckDB's truncation —
    * and to TIMESTAMP_NTZ so written output carries the same
    * no-timezone annotation DuckDB produces.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        acc.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      else acc
    }
  }
}
