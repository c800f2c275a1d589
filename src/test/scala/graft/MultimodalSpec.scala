package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Spark-side plumbing for opaque media columns: schema, determinism,
  * batch shape. Image decode/resize are real (ImageIO); audio/video
  * kernels are documented stubs. */
object MultimodalSpec {
  // lifecycle counters — local[*] executors share the JVM, so these
  // observe per-partition open/close from task threads
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fake codec: header-parses [w, h, seconds] from the payload —
    * stands in for a JavaCV/FFmpeg-backed implementation and proves
    * the seam (provider shipped in the closure, open per partition,
    * close at drain, None → stub fallback) end-to-end. */
  class FakeCodec extends Multimodal.VideoCodec {
    opens.incrementAndGet()
    override def decode(mediaId: Long,
        bytes: Array[Byte]): Option[Multimodal.DecodedMeta] =
      if (bytes.length < 3) None
      else Some(Multimodal.DecodedMeta(mediaId, "video", bytes.length.toLong,
        width = bytes(0).toInt, height = bytes(1).toInt,
        duration_ms = bytes(2).toInt * 1000L))
    override def close(): Unit = closes.incrementAndGet()
  }

  object FakeProvider extends Multimodal.VideoCodecProvider {
    override def open(): Multimodal.VideoCodec = new FakeCodec
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A real PNG payload of the given dimensions, generated offline. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 131) & 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real PNG payloads decode to true width/height") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(37, 21), "srcA"),
      Multimodal.MediaRow(2L, "image", pngBytes(128, 64), "srcA"),
      // corrupt image payload must fall back to the stub, not fail
      Multimodal.MediaRow(3L, "image", Array[Byte](1, 2, 3, 4), "srcB")).toDS()
    val out = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out(0).width == 37 && out(0).height == 21)
    assert(out(1).width == 128 && out(1).height == 64)
    assert(out(2).width % 16 == 0) // stub signature dims
    assert(out.forall(_.duration_ms == 0L))
  }

  test("image decode is header-only: truncated pixel data still yields header dims") {
    import spark.implicits._
    // r19: decodeImage parses the header (PNG IHDR) and never inflates
    // pixel data — the same header-truth contract decodeAudio has
    // always had (a WAV with corrupt SAMPLES returns real metadata).
    // Pin both halves of that contract:
    //  (a) a payload with a valid header but truncated/corrupt pixel
    //      data decodes to its header dimensions (the old full-decode
    //      form stubbed these rows — header truth is the metadata
    //      contract now, matching audio);
    //  (b) a payload that fails the format sniff (no reader claims
    //      it) still falls back to the stub.
    val whole = pngBytes(37, 21)
    // keep signature(8) + IHDR chunk(4 len + 4 type + 13 data + 4 crc)
    // = 33 bytes plus a sliver of IDAT, drop the rest of the pixels
    val truncated = whole.take(48)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", truncated, "srcA"),
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3, 4), "srcB")).toDS()
    val out = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out(0).width == 37 && out(0).height == 21,
      "header dims must decode without the pixel data")
    assert(out(1).width % 16 == 0, "unsniffable payload still stubs")
  }

  test("real PNG resize re-encodes scaled pixels (not the stub digest)") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, "image", pngBytes(64, 64), "srcA")).toDS()
    val resized = Multimodal.resize(media, 16, 16).head
    // independently compute the expected digest of the scaled PNG
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pngBytes(64, 64)))
    val out = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 16, 16, null)
    g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(baos.toByteArray).map(b => f"$b%02x").mkString
    assert(resized.getString(4) == expect)
  }

  test("decode is deterministic and kind-aware") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val a = Multimodal.decode(media).collect().sortBy(_.media_id)
    val b = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    // synthetic image payloads are corrupt → stub dims; video is
    // always the stub; audio is REAL WAV → true duration/rate/channels
    assert(a.filter(_.kind != "audio").forall(m =>
      m.width % 16 == 0 && m.height % 16 == 0))
    assert(a.filter(_.kind == "image").forall(_.duration_ms == 0L))
    assert(a.filter(_.kind != "image").forall(_.duration_ms > 0L))
    a.filter(_.kind == "audio").foreach { m =>
      assert(m.duration_ms == 100 + (m.media_id % 10) * 50,
        s"media ${m.media_id}: true WAV duration expected")
      assert(m.sample_rate == 8000 && m.channels == 1)
    }
    assert(a.filter(_.kind != "audio").forall(m =>
      m.sample_rate == 0 && m.channels == 0))
    assert(a.forall(_.n_bytes >= 64))
  }

  test("real WAV payloads decode to true rate/channels/duration; corrupt audio falls back") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", Multimodal.wavBytes(1000, sampleRate = 16000), "srcA"),
      Multimodal.MediaRow(2L, "audio", Multimodal.wavBytes(250, sampleRate = 44100), "srcA"),
      // corrupt audio payload must fall back to the stub, not fail
      Multimodal.MediaRow(3L, "audio", Array[Byte](9, 9, 9, 9), "srcB")).toDS()
    val out = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out(0).duration_ms == 1000L && out(0).sample_rate == 16000 && out(0).channels == 1)
    assert(out(1).duration_ms == 250L && out(1).sample_rate == 44100 && out(1).channels == 1)
    assert(out(2).sample_rate == 0 && out(2).duration_ms > 0L) // stub signature
  }

  test("pluggable video codec: decodes video rows, per-partition open/close, stub fallback") {
    import spark.implicits._
    MultimodalSpec.opens.set(0)
    MultimodalSpec.closes.set(0)
    // payloads with a parseable fake header: [w, h, seconds, ...]
    def vid(w: Byte, h: Byte, sec: Byte) = Array[Byte](w, h, sec, 0, 0)
    val media = Seq(
      Multimodal.MediaRow(1L, "video", vid(12, 7, 3), "srcA"),
      Multimodal.MediaRow(2L, "video", vid(20, 11, 9), "srcA"),
      // too-short payload: codec returns None → stub fallback
      Multimodal.MediaRow(3L, "video", Array[Byte](1), "srcB"),
      // non-video rows must never touch the codec
      Multimodal.MediaRow(4L, "audio", Multimodal.wavBytes(500), "srcB"))
      .toDS().repartition(2)
    val out = Multimodal.decode(media, Some(MultimodalSpec.FakeProvider))
      .collect().sortBy(_.media_id)
    assert(out(0).width == 12 && out(0).height == 7 && out(0).duration_ms == 3000L)
    assert(out(1).width == 20 && out(1).height == 11 && out(1).duration_ms == 9000L)
    assert(out(2).width % 16 == 0 && out(2).height % 16 == 0) // stub dims
    assert(out(3).sample_rate == 8000 && out(3).duration_ms == 500L)
    // local[*] tasks share this JVM, so the static counters see every
    // partition: one open and one close per partition, no leaks
    assert(MultimodalSpec.opens.get == 2, s"opens=${MultimodalSpec.opens.get}")
    assert(MultimodalSpec.closes.get == MultimodalSpec.opens.get)
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

  test("wavBytes emits the canonical 44-byte-header WAV (the q_media_meta identity)") {
    // the q_media_meta oracle pins n_bytes_audio = 44 + 2 * frames
    // arithmetically — that identity holds only while the JDK writer
    // emits the canonical minimal WAV (RIFF+fmt+data, no extra
    // chunks). If a JDK change adds chunks, this fails before the
    // oracle hash does.
    for ((durMs, rate) <- Seq((50, 8000), (240, 15000), (100, 11000))) {
      val b = Multimodal.wavBytes(durMs, rate, seed = 7L)
      val frames = rate.toLong * durMs / 1000
      assert(b.length == 44 + 2 * frames,
        s"WAV($durMs ms @ $rate Hz): ${b.length} bytes vs ${44 + 2 * frames}")
      assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    }
  }

  test("pngBytes round-trips its true dimensions through ImageIO (the q_media_meta path)") {
    for ((w, h) <- Seq((8, 8), (39, 11), (17, 39))) {
      val b = Multimodal.pngBytes(w, h, seed = 42L)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(img.getWidth == w && img.getHeight == h,
        s"PNG($w x $h) decoded as ${img.getWidth} x ${img.getHeight}")
    }
    // deterministic: same params, same bytes (the layout memo relies
    // on rebuild-equivalence across release/rebuild cycles)
    assert(java.util.Arrays.equals(
      Multimodal.pngBytes(12, 9, 3L), Multimodal.pngBytes(12, 9, 3L)))
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
