package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStreamNoFinalizer, ZstdOutputStreamNoFinalizer}
import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor, DoNotPool}

/** Hadoop `CompressionCodec` for `.zst` files backed by zstd-jni —
  * the JNI binding Spark already ships for parquet/shuffle
  * compression. Hadoop's own ZStandardCodec needs the libhadoop
  * NATIVE library, which containerized Spark deployments routinely
  * lack (the familiar NativeCodeLoader warning); this codec closes
  * that gap so `.jsonl.zst` corpora — the format large public text
  * corpora actually ship in — read through every text-based Spark
  * source once [[Sources.registerCompressionCodecs]] has mapped the
  * extension.
  *
  * Stream-only: the Compressor/Decompressor pooling interfaces exist
  * to recycle native buffer state across streams, which zstd-jni
  * manages internally — so the codec hands the pool inert
  * `@DoNotPool` markers and does all work in the stream wrappers
  * (the established convention of out-of-tree stream codecs).
  *
  * NOT splittable: a zstd frame has no sync markers, so each file is
  * one input split. That is the right trade for corpus ingestion —
  * shard corpora as many medium files (they already arrive that way)
  * and parallelism comes from the file count, exactly like .gz.
  */
class ZstdCodec extends CompressionCodec with Configurable {
  private var conf: Configuration = _
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  override def getDefaultExtension: String = ".zst"

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdCodec.ZstdCompressionInputStream(in)

  override def createInputStream(in: InputStream, d: Decompressor)
  : CompressionInputStream = createInputStream(in)

  override def createOutputStream(out: OutputStream)
  : CompressionOutputStream =
    new ZstdCodec.ZstdCompressionOutputStream(out)

  override def createOutputStream(out: OutputStream, c: Compressor)
  : CompressionOutputStream = createOutputStream(out)

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdCodec.PoolExemptCompressor]
  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdCodec.PoolExemptDecompressor]
  override def createCompressor(): Compressor =
    new ZstdCodec.PoolExemptCompressor
  override def createDecompressor(): Decompressor =
    new ZstdCodec.PoolExemptDecompressor
}

object ZstdCodec {

  private final class ZstdCompressionInputStream(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val z = new ZstdInputStreamNoFinalizer(raw)
    private var closed = false
    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      z.read(b, off, len)
    // resetState supports mid-stream re-sync on SPLITTABLE codecs;
    // a .zst file is one split and one frame, so there is no state
    // boundary to reset to
    override def resetState(): Unit = ()
    override def close(): Unit = if (!closed) {
      closed = true
      try z.close() finally super.close() // NoFinalizer: frees native ctx
    }
  }

  private final class ZstdCompressionOutputStream(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    private val z = new ZstdOutputStreamNoFinalizer(raw)
    private var closed = false
    // guard every late call: CompressionOutputStream.close() itself
    // invokes finish() then out.close(), and wrapping writers
    // (StreamEncoder) may call flush/close more than once — a second
    // touch of the closed zstd stream throws StreamClosed
    override def write(b: Int): Unit = z.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      z.write(b, off, len)
    override def finish(): Unit = if (!closed) z.flush()
    override def resetState(): Unit = ()
    override def close(): Unit = if (!closed) {
      closed = true
      try z.close() finally super.close() // z.close writes the epilogue
    }
  }

  private def streamOnly = throw new UnsupportedOperationException(
    "ZstdCodec is stream-only; the pool marker never (de)compresses")

  /** Inert pool marker — see the codec scaladoc. */
  @DoNotPool
  final class PoolExemptCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit =
      streamOnly
    override def needsInput(): Boolean = streamOnly
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit =
      streamOnly
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = streamOnly
    override def finished(): Boolean = streamOnly
    override def compress(b: Array[Byte], off: Int, len: Int): Int =
      streamOnly
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: Configuration): Unit = ()
  }

  /** Inert pool marker — see the codec scaladoc. */
  @DoNotPool
  final class PoolExemptDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit =
      streamOnly
    override def needsInput(): Boolean = streamOnly
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit =
      streamOnly
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = streamOnly
    override def decompress(b: Array[Byte], off: Int, len: Int): Int =
      streamOnly
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }
}
