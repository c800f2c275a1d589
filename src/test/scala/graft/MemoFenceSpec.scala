package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The untimed-region fence (r18 verdict #6): Bench's disclosed
  * `prebuilt` warm-up list and the session memo stores are the only
  * mechanisms by which work can leave a declared query's timed region.
  * Both are pinned here against a COMMITTED copy, so new
  * precomputation requires a reviewed diff in two files (the source
  * list and this spec) instead of slipping in as one silent line —
  * and `ExtendedQueries.memoCache`/`memoCount`/`memoBytes`/`memoPath`
  * reject an unlisted key at build time, so the fence holds even for
  * code paths no spec exercises.
  *
  * Widening rule: adding a memo is sometimes the RIGHT change (the
  * build-once lifecycle states are all here) — the fence's job is to
  * make that addition visible, reviewed, and disclosed in the bench
  * JSON, not to forbid it.
  */
class MemoFenceSpec extends AnyFunSuite {
  import graft.TestSpark._

  // The committed allowlist — a literal COPY, not a reference to the
  // source sets (referencing them would make the pin a tautology).
  private val expectedPrebuilt = Seq("shingle_cache", "embed_norms_cache",
    "token_count_cache", "skipping_layout", "ivfpq_index",
    "bucket_join_tables", "compacted_layout", "compact_partitioned_layout",
    "scd2_state", "sketch_rollup_state", "stream_cdc_state",
    "stream_scd2_state", "stream_agg_state", "stream_band_registry",
    "cleaned_corpus_cache", "media_layout", "ivfpq_advanced_index",
    "ivfpq_removed_index", "ivfpq_leafwise_index", "jsonl_layout",
    "stream_jsonl_state")

  private val expectedMemoKeys = Set(
    "bands", "bgcounts", "bgmodel", "candpairs", "cleancorpus", "doclens",
    "docprof", "dupcc", "embednorm", "eventprof", "ivfassign", "jacpairs",
    "mhsig", "restricted", "sheval", "shingles", "shsplit", "shtrain",
    "simsig", "tfidfscore", "toktf",
    "ndocs", "ntoks",
    "bloomfilter",
    "bucketjoin", "cleanids", "compactlayout", "compactpart", "ivfpqadv",
    "ivfpqindex", "ivfpqleaf", "ivfpqrm", "jsonl", "medialayout", "scd2adv",
    "sketchroll", "skiplayout", "streamagg", "streamband", "streamcdc",
    "streamjsonl", "streamscd2")

  test("Bench.prebuilt matches the committed allowlist exactly") {
    assert(graft.Bench.prebuilt == expectedPrebuilt,
      s"prebuilt drift — added: ${graft.Bench.prebuilt.diff(expectedPrebuilt)}, " +
        s"removed: ${expectedPrebuilt.diff(graft.Bench.prebuilt)}")
  }

  test("memo key allowlist matches the committed copy exactly") {
    val actual = ExtendedQueries.allowedMemoKeys
    assert(actual == expectedMemoKeys,
      s"memo allowlist drift — added: ${actual -- expectedMemoKeys}, " +
        s"removed: ${expectedMemoKeys -- actual}")
  }

  test("an unlisted memo key is rejected at build time") {
    val e = intercept[IllegalArgumentException] {
      ExtendedQueries.memoCount("sneaky_precompute", spark, sfTiny) { 42L }
    }
    assert(e.getMessage.contains("sneaky_precompute"))
    // and the listed keys still work (the fence rejects, not breaks) —
    // released right after so no scalar memo from this spec outlives it
    assert(ExtendedQueries.memoCount("ndocs", spark, sfTiny) { 7L } == 7L)
    ExtendedQueries.releaseCaches(spark, sfTiny)
  }
}
