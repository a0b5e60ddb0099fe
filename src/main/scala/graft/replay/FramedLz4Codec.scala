package graft.replay

import java.io.{BufferedInputStream, InputStream, OutputStream}

import org.apache.commons.compress.compressors.{CompressorException, CompressorStreamFactory}
import org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream
import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor, DoNotPool, Lz4Codec}

/** R2 — content-based decompression auto-detect for `.lz4` objects.
  *
  * The reference opens every object through
  * `CompressorStreamFactory().createCompressorInputStream(stream)`
  * (JsonEventS3Iterator.java:162-167): the format is detected from the
  * stream's MAGIC BYTES, not the file name, and its default dataset
  * (`taxi-trips.json.lz4`, RePlayer.java:22) is *framed* LZ4 — a format
  * Hadoop's extension-mapped `Lz4Codec` (block format) cannot read.
  *
  * Spark-first mapping: Hadoop codecs are chosen by extension, so this
  * codec takes over the `.lz4` extension (registered last in
  * `io.compression.codecs`, so it wins the factory's extension map) and
  * re-creates the reference's content detection INSIDE the codec:
  *
  *   - a recognized compressor magic (LZ4-frame, and for free: gzip,
  *     bzip2, zstd, xz… on a mislabeled file) → commons-compress stream;
  *   - no known magic → delegate to Hadoop's block-format [[Lz4Codec]],
  *     the other format `.lz4` commonly denotes.
  *
  * Scale note: like every non-splittable codec, a compressed object is one
  * task — exactly the reference's per-object sequential read, but across
  * many objects in parallel. The codec holds no state; executors each
  * instantiate their own via ReflectionUtils.
  */
class FramedLz4Codec extends CompressionCodec with Configurable {

  private var conf: Configuration = new Configuration(false)
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  override def getDefaultExtension: String = ".lz4"

  override def createInputStream(in: InputStream): CompressionInputStream = {
    // mark/reset-capable stream so the factory can sniff then rewind
    val buffered = new BufferedInputStream(in, FramedLz4Codec.BufferBytes)
    try {
      // decompressConcatenated: a multi-frame file (`cat a.lz4 b.lz4`, or
      // any chunked writer flushing one frame per chunk — standard, and
      // what `lz4cat` reads) must decode ALL frames; the factory default
      // stops at the first frame's end-mark and silently truncates the
      // rest of the object (data-loss-shaped, no error raised)
      val detected = new CompressorStreamFactory(true)
        .createCompressorInputStream(buffered) // magic-byte detection
      new FramedLz4Codec.DelegatedInputStream(detected, buffered)
    } catch {
      case _: CompressorException =>
        if (FramedLz4Codec.looksLikeBlockLz4(buffered,
            FramedLz4Codec.maxBlockBytes(conf))) {
          // plausible Hadoop block-LZ4 wire format (length-prefixed, no
          // magic — sniffed structurally, see looksLikeBlockLz4)
          val block = new Lz4Codec()
          block.setConf(conf)
          block.createInputStream(buffered)
        } else {
          // reference parity: "probably just uncompressed"
          // (JsonEventS3Iterator.java:164-166) — a plaintext file named
          // `*.lz4` must replay, not throw at read time and be silently
          // dropped by ignoreCorruptFiles (data-loss-shaped)
          //
          // One misroute hides here: a block-LZ4 file written by a cluster
          // with io.compression.codec.lz4.buffersize above this reader's
          // ceiling fails the structural sniff and lands in pass-through,
          // where its binary rows are then dropped as malformed JSON. Make
          // that observable: if the leading 8 bytes parse as internally
          // consistent lengths whose only defect is exceeding the ceiling,
          // warn with the remedy before passing through.
          FramedLz4Codec.warnIfPlausibleOverCeiling(buffered,
            FramedLz4Codec.maxBlockBytes(conf))
          new FramedLz4Codec.DelegatedInputStream(buffered, buffered)
        }
    }
  }

  /** Pooled (possibly null) decompressors are inert here — the inner
    * streams decompress for themselves. */
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new FramedLz4Codec.DelegatedOutputStream(out)

  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[FramedLz4Codec.InertCompressor]
  override def createCompressor(): Compressor = new FramedLz4Codec.InertCompressor
  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[FramedLz4Codec.InertDecompressor]
  override def createDecompressor(): Decompressor = new FramedLz4Codec.InertDecompressor
}

object FramedLz4Codec {

  private val BufferBytes = 64 * 1024

  /** Largest plausible original-chunk length in a block-LZ4 header. Hadoop
    * writes io.compression.codec.lz4.buffersize-sized chunks (256 KiB by
    * default); the ceiling follows the CONFIGURED buffer size so a cluster
    * writing outsized blocks still routes to the block decoder (never
    * below 64 MiB, never at/above 2^31 where plain-text leading bytes —
    * e.g. `{"ty` = 0x7B227479 — would start passing as lengths). */
  private val DefaultMaxBlockBytes = 64 * 1024 * 1024
  private def maxBlockBytes(conf: Configuration): Long = {
    val configured =
      if (conf == null) 0L
      else conf.getLong("io.compression.codec.lz4.buffersize", 0L)
    math.min(Int.MaxValue.toLong - 1,
      math.max(DefaultMaxBlockBytes.toLong, 2L * configured))
  }

  /** Structural sniff for Hadoop's block-LZ4 wire format, which has NO
    * magic bytes: [origLen:int32 BE][compLen:int32 BE][chunk…]. Both
    * lengths must be positive, origLen bounded, and compLen ≤ LZ4's
    * worst-case expansion of origLen. Text fails this: e.g. a JSON line's
    * first 4 bytes (`{"ty` = 0x7B227479) parse as ~2.07e9 > the ceiling —
    * so unrecognized content falls through to pass-through, matching the
    * reference's plain-text branch. */
  private def looksLikeBlockLz4(in: BufferedInputStream, ceiling: Long): Boolean = {
    in.mark(16)
    val hdr = in.readNBytes(8)
    in.reset()
    if (hdr.length < 8) false
    else {
      def be(o: Int): Long =
        ((hdr(o) & 0xffL) << 24) | ((hdr(o + 1) & 0xffL) << 16) |
          ((hdr(o + 2) & 0xffL) << 8) | (hdr(o + 3) & 0xffL)
      val orig = be(0)
      val comp = be(4)
      orig > 0 && orig <= ceiling &&
        comp > 0 && comp <= orig + orig / 250 + 64 // LZ4 worst-case bound
    }
  }

  /** The pass-through branch's observability hook: true (and logged) when
    * the head of the stream is length-consistent block-LZ4 whose original
    * length merely exceeds `ceiling` — i.e. the one case where pass-through
    * is plausibly a misroute rather than genuine plain text. */
  private[replay] def warnIfPlausibleOverCeiling(
      in: BufferedInputStream, ceiling: Long): Boolean = {
    in.mark(16)
    val hdr = in.readNBytes(8)
    in.reset()
    if (hdr.length < 8) false
    else {
      def be(o: Int): Long =
        ((hdr(o) & 0xffL) << 24) | ((hdr(o + 1) & 0xffL) << 16) |
          ((hdr(o + 2) & 0xffL) << 8) | (hdr(o + 3) & 0xffL)
      val orig = be(0)
      val comp = be(4)
      // consistent as block-LZ4 except for the ceiling — but only within a
      // bounded band above it (a writer buffersize within 8× of the
      // reader's expectation is the plausible misconfiguration). The band
      // cap matters for precision: printable-ASCII text decodes both words
      // to ~0.5–2.1e9 and would otherwise trip the length test ~half the
      // time, while real block-LZ4 headers in the band keep their leading
      // byte non-printable (512 MiB = 0x20000000 is exactly where ASCII
      // begins)
      val suspicious = orig > ceiling &&
        orig <= math.min(8L * ceiling, Int.MaxValue.toLong - 1) &&
        comp > 0 && comp <= orig + orig / 250 + 64
      if (suspicious)
        org.slf4j.LoggerFactory.getLogger(classOf[FramedLz4Codec]).warn(
          s"no compressor magic matched; passing stream through as plain " +
            s"text, but its first 8 bytes parse as a block-LZ4 header with " +
            s"original length $orig above the configured ceiling $ceiling " +
            s"— if this file was written by a cluster with a larger " +
            s"io.compression.codec.lz4.buffersize, set that key on the " +
            s"reader to at least half its value or its rows will be " +
            s"dropped as malformed")
      suspicious
    }
  }

  /** Hadoop config key listing extra codecs; appending this codec makes it
    * the `.lz4` handler (extension map is last-write-wins). */
  val ConfKey = "io.compression.codecs"

  /** Idempotently register this codec on a Hadoop configuration. */
  def register(conf: Configuration): Unit = {
    val cls = classOf[FramedLz4Codec].getName
    val existing = Option(conf.get(ConfKey)).filter(_.nonEmpty)
    if (!existing.exists(_.contains(cls)))
      conf.set(ConfKey, existing.fold(cls)(e => s"$e,$cls"))
  }

  /** CompressionInputStream view over an already-decompressing stream.
    * `raw` (the underlying file stream) goes to super for position/close;
    * reads come from `decompressed`. */
  private final class DelegatedInputStream(decompressed: InputStream, raw: InputStream)
      extends CompressionInputStream(raw) {
    override def read(): Int = decompressed.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      decompressed.read(b, off, len)
    override def resetState(): Unit =
      throw new UnsupportedOperationException("not a splittable codec")
    override def close(): Unit =
      try decompressed.close() finally super.close()
  }

  /** CompressionOutputStream writing the LZ4 *frame* format — what the
    * reference's datasets actually contain. */
  private final class DelegatedOutputStream(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    private val lz4 = new FramedLZ4CompressorOutputStream(raw)
    override def write(b: Int): Unit = lz4.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      lz4.write(b, off, len)
    override def finish(): Unit = lz4.finish()
    override def resetState(): Unit =
      throw new UnsupportedOperationException("not a splittable codec")
    override def close(): Unit =
      try lz4.close() finally super.close()
  }

  /** The codec pool insists on (de)compressor instances even though the
    * delegated streams do all the work — these satisfy the contract and
    * must never be asked to actually (de)compress. */
  @DoNotPool
  final class InertDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = false
    override def decompress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException("stream-delegated codec")
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }

  @DoNotPool
  final class InertCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = false
    override def compress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException("stream-delegated codec")
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(c: Configuration): Unit = ()
  }
}
