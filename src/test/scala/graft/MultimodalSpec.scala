package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Spark-side plumbing for opaque media columns: schema, determinism,
  * batch shape (the codec itself is a documented stub). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decode is deterministic and kind-aware") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val a = Multimodal.decode(media).collect().sortBy(_.media_id)
    val b = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.width % 16 == 0 && m.height % 16 == 0))
    assert(a.filter(_.kind == "image").forall(_.duration_ms == 0L))
    assert(a.filter(_.kind != "image").forall(_.duration_ms > 0L))
    assert(a.forall(_.n_bytes >= 64))
  }

  test("feature extraction yields fixed-width normalized vectors") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 10))
    assert(feats.schema("features").dataType.simpleString == "array<float>")
    val rows = feats.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getSeq[Float](1).length == 8))
    assert(rows.forall(_.getSeq[Float](1).forall(v => v >= 0f && v <= 1f)))
  }

  test("resize is deterministic, target-dimension-dependent, schema-stable") {
    val media = Multimodal.syntheticMedia(spark, 12)
    val a = Multimodal.resize(media, 224, 224).collect().sortBy(_.getLong(0))
    val b = Multimodal.resize(media, 224, 224).collect().sortBy(_.getLong(0))
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall(r => r.getInt(2) == 224 && r.getInt(3) == 224))
    // a different target size must produce different payloads
    val c = Multimodal.resize(media, 64, 64).collect().sortBy(_.getLong(0))
    a.zip(c).foreach { case (x, y) =>
      assert(x.getString(4) != y.getString(4))
    }
  }

  test("frame sampling emits keys only, correct cadence") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, everyMs = 1000)
    val counts = frames.groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durs = decoded.collect().filter(_.duration_ms > 0)
      .map(m => m.media_id -> m.duration_ms).toMap
    durs.foreach { case (id, d) =>
      val expect = (d - 1) / 1000 + 1
      assert(counts(id) == expect, s"media $id: ${counts(id)} vs $expect")
    }
    assert(frames.columns.toSeq == Seq("media_id", "frame_ms"))
  }
}
