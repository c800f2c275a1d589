package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with typed metadata — the Spark
  * side (schema, partitioning, batch shape, lineage) is real and
  * tested; the codec kernels are STUBS (this container has no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * dimensions/features from the md5 of the payload, so tests are
  * reproducible and the stub is trivially swappable for a real codec
  * (same signature, per-partition batching already in place).
  *
  * 100 TB design notes:
  *  - payloads stay in executor space end-to-end (no driver collect);
  *  - decode/feature-extract run via `mapPartitions` so a real codec
  *    amortizes per-batch init (model load, JNI) across the partition —
  *    the same batching contract as Arrow-based UDFs;
  *  - metadata columns (kind/width/duration) are plain columns →
  *    predicate pushdown and partition pruning still apply to scans
  *    that filter before decoding;
  *  - frame sampling emits (media_id, frame_no) keys first and decodes
  *    after, so the shuffle moves keys, not pixels.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      source: String)

  /** Decoded metadata (stub: md5-derived, deterministic). */
  case class DecodedMeta(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, duration_ms: Long)

  /** Deterministic fake "decode": header fields derived from the
    * payload hash. REPLACE with a real codec per `kind` — the
    * per-partition batching below is the production shape. */
  private def decodeStub(id: Long, kind: String, bytes: Array[Byte]): DecodedMeta = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def u(i: Int): Int = h(i) & 0xff
    DecodedMeta(id, kind, bytes.length.toLong,
      width = 16 * (1 + u(0) % 240),
      height = 16 * (1 + u(1) % 135),
      duration_ms = if (kind == "image") 0L else 1000L * (1 + u(2)))
  }

  /** Decode a media Dataset to metadata rows; one codec init per
    * partition (the `it =>` closure), streaming through rows. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: init codec/model HERE, once per partition
      it.map(m => decodeStub(m.media_id, m.kind, m.bytes))
    }
  }

  /** Stub feature extractor: 8-dim deterministic pseudo-embedding from
    * the payload hash (swap for a real model; batch shape identical). */
  def extractFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val h = java.security.MessageDigest.getInstance("MD5").digest(m.bytes)
        (m.media_id, h.take(8).map(b => (b & 0xff) / 255.0f))
      }
    }.toDF("media_id", "features")
  }

  /** Stub resize: emits the target dimensions plus a deterministic
    * payload digest for the "resized" bytes (a real implementation
    * swaps the digest for the actual scaled image; the per-partition
    * batching and the metadata-only schema downstream are the
    * production shape — resized payloads stay in executor space). */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: init the scaler once per partition HERE
      it.map { m =>
        val h = java.security.MessageDigest.getInstance("MD5")
        h.update(m.bytes)
        h.update(s":$width:$height".getBytes("UTF-8"))
        val digest = h.digest().map(b => f"$b%02x").mkString
        (m.media_id, m.kind, width, height, digest)
      }
    }.toDF("media_id", "kind", "width", "height", "resized_digest")
  }

  /** Frame-sample plan for video rows: one row per sampled frame
    * (every `everyMs`). Emits keys only — decode joins in later, so
    * the explode shuffles (media_id, frame_no), never the payload. */
  def sampleFrames(decoded: Dataset[DecodedMeta], everyMs: Long): DataFrame = {
    val d = decoded.toDF()
    d.filter(col("duration_ms") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("frame_ms"))
  }

  /** Synthetic media table for tests/demos: deterministic payloads. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { i =>
      val kind = if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video"
      val bytes = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 131 + j * 17) % 251).toByte)
      MediaRow(i, kind, bytes, s"src${i % 5}")
    }
  }
}
