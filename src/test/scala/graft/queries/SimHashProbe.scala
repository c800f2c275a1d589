package graft.queries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val docs = spark.read.parquet("/tmp/graft_scale/cx16/documents.parquet")
      .repartition(32)
    docs.cache().count()
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime()-t0)/1e9, n) }
      println(f"[shprobe] $name%-18s min=${ts.map(_._1).min}%.3f s (n=${ts.head._2})")
    }
    val nBits = 64; val nHex = nBits / 4
    def withHex: DataFrame = docs.select(col("doc_id").as("id"),
      transform(filter(split(col("text"), " "), t => length(t) > 0),
        t => substring(md5(t.cast("binary")), 1, nHex)).as("__hx"))
      .filter(size(col("__hx")) > 0)
    def hofForm: DataFrame = {
      val bitSums = (0 until nBits).map { j =>
        val p = 1 << (j % 4)
        aggregate(col("__hx"), lit(0L), (acc, h) => {
          val nib = conv(substring(h, j / 4 + 1, 1), 16, 10).cast("int")
          acc + ((nib.divide(p).cast("int") % 2) * 2 - 1).cast("long")
        })
      }
      withHex.select(col("id"),
        concat((0 until nBits).map(j =>
          when(bitSums(j) > 0, "1").otherwise("0")): _*).as("simhash"))
    }
    def kernelForm: DataFrame = withHex.select(col("id"),
      graft.functions.GraftFunctions.simHashSign(col("__hx"), nBits).as("simhash"))
    // force REAL evaluation: aggregate over signature content, not count
    def force(df: DataFrame): Long =
      df.agg(sum(length(col("simhash"))), count(lit(1))).head.getLong(1)
    time("kernel_a") { force(kernelForm) }
    time("hof_a")    { force(hofForm) }
    time("kernel_b") { force(kernelForm) }
    time("hof_b")    { force(hofForm) }
    docs.unpersist(); spark.stop()
  }
}
