package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}

/** Hadoop `CompressionCodec` for zstd backed by zstd-jni — the
  * library Spark already ships for shuffle/parquet compression.
  * Hadoop's own `ZStandardCodec` needs libhadoop compiled against
  * native zstd, which most container images (this one included)
  * don't carry; routing the TEXT-source path (JSONL corpus shards)
  * through zstd-jni removes that deployment dependency entirely.
  *
  * Pooling contract: Hadoop's line readers acquire a pooled
  * (de)compressor and hand it to `createInputStream`/
  * `createOutputStream`. zstd-jni exposes stream transforms, not the
  * incremental buffer state machine the `Compressor`/`Decompressor`
  * interfaces model, so this codec follows the established pattern of
  * stream-backed codecs: the pooled object is an inert placeholder
  * (`DIRECT_DECOMPRESSOR` analog) and the streams do the work. The
  * placeholder throws if something ever drives it directly — loud,
  * not silently wrong.
  *
  * Not splittable (a zstd frame has no sync markers a reader could
  * seek to), same as Hadoop's gzip: one file = one split, so shard
  * corpora into many files — which [[CorpusIO.writeJsonl]]'s `shards`
  * parameter already forces the caller to decide.
  */
final class ZstdJniCodec extends CompressionCodec {

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdJniCodec.ZstdJniOutputStream(out)

  override def createOutputStream(out: OutputStream,
      compressor: Compressor): CompressionOutputStream =
    createOutputStream(out) // stream-backed: pooled object unused

  override def createCompressor(): Compressor =
    new ZstdJniCodec.InertCompressor

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdJniCodec.InertCompressor]

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdJniCodec.ZstdJniInputStream(in)

  override def createInputStream(in: InputStream,
      decompressor: Decompressor): CompressionInputStream =
    createInputStream(in) // stream-backed: pooled object unused

  override def createDecompressor(): Decompressor =
    new ZstdJniCodec.InertDecompressor

  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdJniCodec.InertDecompressor]

  override def getDefaultExtension: String = ".zst"
}

object ZstdJniCodec {

  private final class ZstdJniOutputStream(out: OutputStream)
      extends CompressionOutputStream(out) {
    private val zos = new ZstdOutputStream(out)

    override def write(b: Int): Unit = zos.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      zos.write(b, off, len)
    override def flush(): Unit = zos.flush()
    // Hadoop's CompressionOutputStream contract: finish() completes
    // the compressed output WITHOUT closing the underlying stream. A
    // flush alone leaves the zstd frame footer unwritten — a reader
    // consuming the file between finish() and close() (SequenceFile-
    // style writers hold streams open) would see truncated input.
    // closeFrameOnFlush ends the frame incl. footer; a later write
    // starts a new frame, which the continuous-mode reader accepts.
    override def finish(): Unit = {
      zos.setCloseFrameOnFlush(true)
      try zos.flush() finally zos.setCloseFrameOnFlush(false)
    }
    override def resetState(): Unit = ()
    override def close(): Unit = zos.close() // closes `out` too
  }

  private final class ZstdJniInputStream(in: InputStream)
      extends CompressionInputStream(in) {
    private val zis = {
      val z = new ZstdInputStream(in)
      // multi-frame files (zstd CLI concatenation) read through,
      // matching gzip-member semantics
      z.setContinuous(true)
      z
    }

    override def read(): Int = zis.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      zis.read(b, off, len)
    override def available(): Int = zis.available()
    override def resetState(): Unit = ()
    override def close(): Unit = zis.close()
  }

  private def inert = throw new UnsupportedOperationException(
    "ZstdJniCodec is stream-backed; the pooled (de)compressor is a " +
      "placeholder and must not be driven directly")

  /** Placeholder for Hadoop's codec pool — see class scaladoc. */
  final class InertCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = inert
    override def needsInput(): Boolean = inert
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = inert
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = inert
    override def finished(): Boolean = inert
    override def compress(b: Array[Byte], off: Int, len: Int): Int = inert
    override def reset(): Unit = () // pool returns call reset; no state
    override def end(): Unit = ()
    override def reinit(conf: org.apache.hadoop.conf.Configuration): Unit = ()
  }

  /** Placeholder for Hadoop's codec pool — see class scaladoc. */
  final class InertDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = inert
    override def needsInput(): Boolean = inert
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = inert
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = false
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = inert
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }
}
