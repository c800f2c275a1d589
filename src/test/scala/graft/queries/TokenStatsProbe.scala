package graft.queries

import org.apache.spark.sql.functions.{split => sqlSplit, _}

/** Forced-eval probe for the TokenStats kernel (r11): one pass vs the
  * declarative split family at ×16 documents (80 000 docs). Sums over
  * the produced VALUES — count() probes prune pruneable projections
  * and measure nothing (BASELINE.md / graft-measurement-traps).
  *
  * Also asserts the one-split-per-doc claim indirectly: the fused
  * gate column set (langid + quality + repetition — what CorpusClean
  * stage 1/2 and q_quality_gates evaluate per doc) should cost ~the
  * single-stat kernel pass, not 4-6 splits.
  */
object TokenStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val d = "/root/testdata/sf0.1"
    val docs = t(spark, d, "documents")
      .crossJoin(spark.range(16).select(col("id").as("rep")))
      .select(col("doc_id") * 16 + col("rep") as "doc_id", col("text"))

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val r = mk.agg(sum(col("probe"))).head.getDouble(0)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[probe] $name%-32s min=${ts.map(_._1).min}%.3f s (v=${ts.head._2}%.1f)")
    }

    val stop = Seq("a", "the")
    val w = sqlSplit(col("text"), " ")
    // the OLD declarative family (4 independent splits + distinct + HOF)
    time("declarative_4way") {
      docs.select((size(w).cast("double") +
        size(array_distinct(w)).cast("double") +
        expr("size(filter(split(text, ' '), x -> x IN ('a', 'the')))").cast("double") +
        length(col("text")).cast("double")).as("probe"))
    }
    // the kernel: all four stats in one pass
    val st = graft.functions.GraftFunctions.tokenStats(col("text"), stop)
    time("kernel_1pass") {
      docs.select((st.getField("n_tokens").cast("double") +
        st.getField("n_distinct").cast("double") +
        st.getField("stopword_hits").cast("double") +
        st.getField("char_len").cast("double")).as("probe"))
    }
    // composite gates, old shape: langId + qualityOk + repetition as
    // they were pre-kernel (each helper re-splitting)
    time("gates_old_shape") {
      val ratio = size(filter(w, x => x.isin(stop: _*))).cast("double") /
        size(w).cast("double")
      val ttr = size(array_distinct(w)).cast("double") / size(w).cast("double")
      val dup = lit(1.0) - ttr
      docs.select(((ratio >= 0.05) && (size(w).cast("long") >= 30) &&
        (ttr >= 0.3) && (dup <= 0.5)).cast("double").as("probe"))
    }
    // composite gates, kernel shape (all fields from ONE CSE'd call)
    time("gates_kernel") {
      val nTok = st.getField("n_tokens")
      val ratio = st.getField("stopword_hits").cast("double") / nTok.cast("double")
      val ttr = st.getField("n_distinct").cast("double") / nTok.cast("double")
      val dup = lit(1.0) - ttr
      docs.select(((ratio >= 0.05) && (nTok >= 30) &&
        (ttr >= 0.3) && (dup <= 0.5)).cast("double").as("probe"))
    }
    spark.stop()
  }
}
