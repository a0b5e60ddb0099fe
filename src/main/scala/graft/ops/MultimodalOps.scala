package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing (SURVEY.md §2B X29): media carried as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted inside
  * partition-parallel tasks.
  *
  * Three tiers, in the order they landed: (1) [[stubDecode]] — the
  * original plumbing demo with deterministic fake dimensions (kept for
  * x29/x29b/x29c, whose point is the typed-Dataset/mapPartitions batch
  * shape); (2) REAL container-header parsing — PNG IHDR/JPEG SOF and
  * RIFF/WAVE chunk walks (x29d/x29e); (3) REAL sample decode — PNG pixel
  * decode via JDK `Inflater` + per-row unfilter and WAV 16-bit-LE PCM
  * stats (x29f/x29g), no codec dependency, oracle-replayed from the
  * builder arithmetic. Nothing in the decode path is stubbed anymore;
  * only exotic containers (MP4, progressive-JPEG entropy data) are out
  * of scope.
  */
object MultimodalOps {

  /** Typed row produced by the "decoder". */
  final case class MediaMeta(doc_id: Long, byte_len: Int, width: Int,
      height: Int, channels: Int, n_frames: Int)

  /** STUB decode: a real implementation would parse the container header
    * (JPEG/PNG/WAV/MP4) from `bytes`; here dimensions are a deterministic
    * function of the payload so results are reproducible and verifiable. */
  def stubDecode(docId: Long, bytes: Array[Byte]): MediaMeta =
    MediaMeta(
      doc_id = docId,
      byte_len = bytes.length,
      width = 32 + (docId % 96).toInt,
      height = 32 + ((docId / 2) % 96).toInt,
      channels = 3,
      n_frames = bytes.length / 64) // "frame-sample": one frame per 64 bytes

  /** X29 — binary ingestion + decode + metadata projection: text re-encoded
    * as a binary payload stands in for image/audio bytes; decode runs
    * per-partition over the typed boundary (the mapPartitions batch shape a
    * Pandas-UDF/Arrow path would also use). */
  def x29Multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bin = t(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("media_bytes"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** X29 — multimodal columns flowing through relational ops: join decoded
    * metadata back to the catalog and aggregate by shape bucket, proving
    * binary-derived columns compose with groupBy/join like any other. */
  def x29bShapeStats(s: SparkSession, d: String): DataFrame = {
    val meta = x29Multimodal(s, d)
    val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
    meta.join(docs, "doc_id")
      .groupBy(col("lang"), (col("width") >= 80).as("is_wide"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("lang"), col("is_wide"))
  }

  /** X29 — frame sampling: every 4th frame of each media payload as
    * (frame index, byte offset, length) — the metadata-driven stride
    * sample a video pipeline hands to the decoder, computed without
    * touching the bytes (the decoder seeks the offsets later). The
    * explode stays proportional to frames KEPT, not frames present. */
  def x29cFrameSample(s: SparkSession, d: String): DataFrame =
    x29Multimodal(s, d)
      .select(col("doc_id"), col("n_frames"))
      .filter(col("n_frames") > 0) // sequence(0, -1) would step backwards
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * 64)
      .withColumn("frame_bytes", lit(64))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Typed row produced by the REAL header parser. */
  final case class HeaderMeta(doc_id: Long, format: String, width: Int,
      height: Int, valid: Boolean)

  /** REAL container-header metadata extraction — PNG IHDR and JPEG SOF
    * parsing are public byte formats needing no codec library, so this
    * part of the decode path is genuine logic, not a stub (only pixel
    * decode remains stubbed). PNG: 8-byte signature, then the IHDR chunk
    * carries width/height as big-endian u32 at offsets 16/20. JPEG: SOI
    * (FFD8), then markers scanned by their length fields until a frame
    * header (SOF0..SOF15 minus DHT/JPG/DAC) yields height/width as
    * big-endian u16 at payload offsets 3/5. Anything else (or a
    * truncated/corrupt payload) → (unknown, valid = false) — the
    * quarantine row a production pipeline routes out of the decode
    * stage instead of crashing on. */
  def parseMediaHeader(docId: Long, b: Array[Byte]): HeaderMeta = {
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    def isPng = b.length >= 24 &&
      pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
      new String(b.slice(12, 16), "US-ASCII") == "IHDR"
    def jpegSof: Option[(Int, Int)] = {
      if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length && u8(i) == 0xff) {
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // 0xff fill/padding bytes are spec-legal
        else if (m == 0xd9) return None // EOI before any frame header
        else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7))
          i += 2 // standalone: SOI, TEM, RSTn
        else {
          val len = u16(i + 2)
          if (len < 2 || i + 2 + len > b.length) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (len < 7) return None
            return Some((u16(i + 7), u16(i + 5))) // (width, height)
          }
          i += 2 + len
        }
      }
      None
    }
    if (isPng) {
      val (w, h) = (u32(16), u32(20))
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        HeaderMeta(docId, "png", w.toInt, h.toInt, valid = true)
      else HeaderMeta(docId, "unknown", 0, 0, valid = false)
    } else jpegSof match {
      case Some((w, h)) if w > 0 && h > 0 =>
        HeaderMeta(docId, "jpeg", w, h, valid = true)
      case _ => HeaderMeta(docId, "unknown", 0, 0, valid = false)
    }
  }

  /** Deterministic REAL-format payload builder for the fixture: even ids
    * get a PNG whose IHDR encodes (32+id%96, 32+(id/2)%96), odd ids a
    * JPEG whose SOF0 encodes the same dims, and every 7th id a payload
    * with its magic bytes zeroed (the corrupt-sample case). The builder
    * writes real headers and the parser reads them back — a builder or
    * parser bug breaks the round-trip, and the oracle checks the result
    * against first-principles arithmetic on the id. */
  def buildMediaPayload(docId: Long, filler: Array[Byte]): Array[Byte] = {
    val w = 32 + (docId % 96).toInt
    val h = 32 + ((docId / 2) % 96).toInt
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    if (docId % 2 == 0) {
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
      be32(13) // IHDR length
      out.write('I'); out.write('H'); out.write('D'); out.write('R')
      be32(w); be32(h)
      out.write(8); out.write(2); out.write(0); out.write(0); out.write(0)
      be32(0) // CRC placeholder (header parse does not verify CRC)
    } else {
      out.write(0xff); out.write(0xd8) // SOI
      out.write(0xff); out.write(0xe0); be16(16) // APP0, 16-byte payload
      out.write("JFIF".getBytes("US-ASCII")); out.write(0)
      (0 until 9).foreach(_ => out.write(0))
      out.write(0xff); out.write(0xc0); be16(11) // SOF0, 1 component
      out.write(8); be16(h); be16(w); out.write(1)
      out.write(1); out.write(0x11); out.write(0)
    }
    out.write(filler, 0, math.min(filler.length, 32))
    val bytes = out.toByteArray
    if (docId % 7 == 0) { // corrupt the magic — quarantine case
      bytes(0) = 0; bytes(1) = 0
    }
    bytes
  }

  /** X29 — REAL header metadata extraction + corrupt-sample quarantine:
    * build real PNG/JPEG headers, parse them back per-partition over the
    * typed boundary, quarantine what does not parse. The oracle checks
    * the parsed dims against the id arithmetic the builder encoded —
    * the full builder→bytes→parser round-trip is verified, not just the
    * plumbing. */
  def x29dHeaderMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bin = t(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("filler"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions(_.map { case (id, filler) =>
        parseMediaHeader(id, buildMediaPayload(id, filler)) })
      .toDF()
      .select(col("doc_id"), col("format"),
        when(col("valid"), col("width")).as("width"),
        when(col("valid"), col("height")).as("height"),
        col("valid"))
      .orderBy(col("doc_id"))
  }

  /** Typed row produced by the WAV header parser. */
  final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_samples: Long, duration_ms: Long, valid: Boolean)

  /** REAL RIFF/WAVE header parsing — the audio twin of
    * [[parseMediaHeader]]: 'RIFF' + size + 'WAVE', then chunks scanned by
    * their little-endian length fields until 'fmt ' yields (channels,
    * sample rate, bits/sample) and 'data' yields the payload size;
    * n_samples = data bytes / block align, duration = n_samples·1000 /
    * rate. PCM format tag (1) only — anything else, truncated, or
    * inconsistent (zero rate/channels/bits, block align mismatch)
    * quarantines. */
  def parseWavHeader(docId: Long, b: Array[Byte]): AudioMeta = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      if (i + 4 <= b.length) new String(b.slice(i, i + 4), "US-ASCII") else ""
    val bad = AudioMeta(docId, 0, 0, 0, 0L, 0L, valid = false)
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return bad
    // the cursor is a Long: chunk sizes are unsigned u32, and two large
    // declared sizes would overflow an Int cursor into a negative index
    // (an ArrayIndexOutOfBounds crash where the contract says quarantine)
    var i = 12L
    var fmt: Option[(Int, Long, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataBytes: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val ii = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue
      val id = tag(ii)
      val len = le32(ii + 4) // u32: 0..4294967295, never negative
      if (id == "fmt ") {
        if (len < 16 || i + 8 + 16 > b.length) return bad
        val audioFormat = le16(ii + 8)
        if (audioFormat != 1) return bad // PCM only
        fmt = Some((le16(ii + 10), le32(ii + 12), le16(ii + 22), le16(ii + 20)))
      } else if (id == "data") {
        // the data chunk's declared size counts even when the payload is
        // elided (header-only fixture bytes) — a real pipeline reads the
        // size, not the bytes, at the metadata stage
        dataBytes = Some(len)
      }
      // chunks are word-aligned: odd sizes are padded by one byte
      i += 8L + len + (len & 1L)
    }
    (fmt, dataBytes) match {
      case (Some((ch, rate, bits, align)), Some(db))
          if ch > 0 && rate > 0 && bits > 0 && align == ch * bits / 8 &&
            align > 0 && db % align == 0 =>
        val n = db / align
        AudioMeta(docId, rate.toInt, ch, bits, n, n * 1000L / rate, valid = true)
      case _ => bad
    }
  }

  /** Deterministic WAV header builder: PCM fmt chunk with id-derived
    * (rate ∈ {8k, 16k, 22.05k, 44.1k}, channels = 1 + id%2, 16-bit) and a
    * data chunk DECLARING id-derived sample counts (payload elided —
    * the metadata stage reads sizes, not samples). Every 5th id gets a
    * non-PCM format tag (the compressed-audio quarantine case). */
  def buildWavPayload(docId: Long): Array[Byte] = {
    val rates = Array(8000, 16000, 22050, 44100)
    val rate = rates((docId % 4).toInt)
    val ch = 1 + (docId % 2).toInt
    val bits = 16
    val align = ch * bits / 8
    val nSamples = 100L + (docId % 1000)
    val dataLen = nSamples * align
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(if (docId % 5 == 0) 85 else 1) // 85 = MP3-in-WAV: quarantine
    le16(ch); le32(rate); le32(rate.toLong * align); le16(align); le16(bits)
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    out.toByteArray
  }

  /** X29 — audio header metadata + quarantine: the WAV twin of
    * [[x29dHeaderMeta]], proving the audio modality's metadata stage with
    * real RIFF chunk-walking (duration/sample-rate/channel extraction is
    * what an audio curation pass filters on — and it never touches the
    * sample bytes). */
  def x29eAudioMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
    ids.mapPartitions(_.map(id => parseWavHeader(id, buildWavPayload(id))))
      .toDF()
      .select(col("doc_id"),
        when(col("valid"), col("sample_rate")).as("sample_rate"),
        when(col("valid"), col("channels")).as("channels"),
        when(col("valid"), col("n_samples")).as("n_samples"),
        when(col("valid"), col("duration_ms")).as("duration_ms"),
        col("valid"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // REAL sample decode (round 10): the pixel/PCM stage that was the
  // documented stub is now genuine JDK-only codec logic — PNG IDAT via
  // java.util.zip.Inflater + per-row unfilter (all five PNG filter
  // types), WAV 16-bit-LE PCM sample arithmetic. The builders write
  // real compressed/filtered payloads whose pixel/sample values are a
  // deterministic function of (doc_id, x, y) / (doc_id, frame, channel),
  // so the DuckDB oracle replays the generator arithmetic from the id
  // alone — agreement proves the full encode→deflate→inflate→unfilter→
  // stats round-trip, not just the plumbing.
  // ------------------------------------------------------------------

  /** Pixel value formulas shared by the PNG builder and the oracle:
    * deterministic in (doc_id, x, y), always in 0..255. */
  @inline private def pxR(id: Long, x: Int, y: Int): Int = ((x * 7L + y * 13L + id) % 256).toInt
  @inline private def pxG(id: Long, x: Int, y: Int): Int = ((x * 3L + y * 5L + 2 * id) % 256).toInt
  @inline private def pxB(id: Long, x: Int, y: Int): Int = ((x * 11L + y + 3 * id) % 256).toInt

  /** Image dims for the pixel fixture (small: the oracle unnests a
    * per-pixel range, so w·h stays ≤ 16·16). */
  @inline private def pngW(id: Long): Int = 8 + (id % 9).toInt
  @inline private def pngH(id: Long): Int = 8 + ((id / 3) % 9).toInt

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Build a REAL 8-bit RGB PNG: signature, IHDR, one zlib-deflated IDAT
    * of filtered scanlines (filter type cycles y%5 through None/Sub/Up/
    * Average/Paeth so the decoder's unfilter paths are all exercised),
    * IEND — each chunk with a real CRC32. Every 7th id gets its zlib
    * header zeroed inside IDAT (the corrupt-stream quarantine case: the
    * chunk structure still parses, inflate fails). */
  def buildPngImage(docId: Long): Array[Byte] = {
    val w = pngW(docId); val h = pngH(docId); val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte]((1 + stride) * h)
    val cur = new Array[Int](stride)
    val prior = new Array[Int](stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        cur(x * bpp) = pxR(docId, x, y)
        cur(x * bpp + 1) = pxG(docId, x, y)
        cur(x * bpp + 2) = pxB(docId, x, y)
        x += 1
      }
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val left = if (i >= bpp) cur(i - bpp) else 0
        val up = prior(i)
        val upLeft = if (i >= bpp) prior(i - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(y * (1 + stride) + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = zBuf.toByteArray
    if (docId % 7 == 0 && idat.length >= 2) { idat(0) = 0; idat(1) = 0 }

    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Unit = {
        out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
        out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      be32(data.length.toLong)
      val typB = typ.getBytes("US-ASCII")
      out.write(typB, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(typB); crc.update(data)
      be32(crc.getValue)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def ibe32(v: Int): Unit = { ihdr.write(v >>> 24); ihdr.write((v >>> 16) & 0xff)
      ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff) }
    ibe32(w); ibe32(h)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Typed row of REAL pixel statistics (integer sums, so the oracle
    * hash-compares exactly — means are sum/n_px downstream). */
  final case class PixelStats(doc_id: Long, width: Int, height: Int,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long, valid: Boolean)

  /** REAL PNG pixel decode shared by [[decodePngStats]] (x29f) and
    * [[decodePngAHash]] (x108): walk chunks (CRC-verified), inflate the
    * concatenated IDAT stream with [[java.util.zip.Inflater]], unfilter
    * every scanline (all five PNG filter types), and return the full
    * interleaved RGB grid (w·h·3 ints — bounded, the fixture is ≤16×16).
    * Any structural damage — bad signature, CRC mismatch, inflate
    * failure, short pixel stream, unknown filter type — returns None
    * (quarantine) instead of crashing. 8-bit RGB (colour type 2) only. */
  private[ops] def decodePngGrid(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val bad: Option[(Int, Int, Array[Int])] = None
    def u8(i: Int): Int = b(i) & 0xff
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 8 || !sig.indices.forall(i => u8(i) == sig(i))) return bad
    var i = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    try {
      while (i + 12 <= b.length) {
        val len = u32(i)
        if (len > Int.MaxValue - 12 || i + 12 + len > b.length) return bad
        val typ = new String(b.slice(i + 4, i + 8), "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(b, i + 4, 4 + len.toInt)
        if (crc.getValue != u32(i + 8 + len.toInt)) return bad
        typ match {
          case "IHDR" =>
            if (len != 13) return bad
            w = u32(i + 8).toInt; h = u32(i + 12).toInt
            val bitDepth = u8(i + 16); val colorType = u8(i + 17)
            if (bitDepth != 8 || colorType != 2) return bad // 8-bit RGB only
          case "IDAT" => idat.write(b, i + 8, len.toInt)
          case _ => ()
        }
        i += 12 + len.toInt
      }
      if (w <= 0 || h <= 0 || idat.size == 0) return bad
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val stride = w * 3
      val raw = new Array[Byte]((1 + stride) * h)
      var off = 0
      while (!inflater.finished() && off < raw.length) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // truncated stream (needsInput) or an FDICT preset-dictionary
        // stream (needsDictionary): both make inflate() return 0 forever
        // without finishing — quarantine rather than spin
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return bad
        off += n
      }
      inflater.end()
      if (off != raw.length) return bad
      val cur = new Array[Int](stride)
      val prior = new Array[Int](stride)
      val grid = new Array[Int](stride * h)
      var y = 0
      while (y < h) {
        val ft = raw(y * (1 + stride)) & 0xff
        if (ft > 4) return bad
        var j = 0
        while (j < stride) {
          val f = raw(y * (1 + stride) + 1 + j) & 0xff
          val left = if (j >= 3) cur(j - 3) else 0
          val up = prior(j)
          val upLeft = if (j >= 3) prior(j - 3) else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, upLeft)
          }
          cur(j) = (f + pred) & 0xff
          j += 1
        }
        System.arraycopy(cur, 0, grid, y * stride, stride)
        System.arraycopy(cur, 0, prior, 0, stride)
        y += 1
      }
      Some((w, h, grid))
    } catch {
      case _: java.util.zip.DataFormatException => bad
      case _: ArrayIndexOutOfBoundsException => bad
    }
  }

  /** REAL PNG pixel decode reduced to per-channel integer sums (x29f) —
    * [[decodePngGrid]] + one pass over the grid; quarantine → invalid row. */
  def decodePngStats(docId: Long, b: Array[Byte]): PixelStats =
    decodePngGrid(b) match {
      case None => PixelStats(docId, 0, 0, 0L, 0L, 0L, 0L, valid = false)
      case Some((w, h, px)) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          sr += px(i); sg += px(i + 1); sb += px(i + 2); i += 3
        }
        PixelStats(docId, w, h, w.toLong * h, sr, sg, sb, valid = true)
    }

  /** Typed row of the 64-bit average-hash: the top/bottom 32 bits ride in
    * two Longs so neither engine touches the sign bit. */
  final case class PHashRow(doc_id: Long, hash_hi: Long, hash_lo: Long,
      valid: Boolean)

  /** Perceptual average-hash (aHash) over the DECODED pixel grid: sample
    * an 8×8 grid by integer nearest-neighbour (xs = i·w/8, ys = j·h/8),
    * gray = r+g+b per sample (0..765, no lossy division), set bit
    * p = 8·j+i iff 64·gray > Σgray — all integer arithmetic, so the
    * DuckDB oracle replays it exactly from the pixel formulas. */
  def decodePngAHash(docId: Long, b: Array[Byte]): PHashRow =
    decodePngGrid(b) match {
      case None => PHashRow(docId, 0L, 0L, valid = false)
      case Some((w, h, px)) =>
        val gray = new Array[Long](64)
        var tot = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val xs = i * w / 8; val ys = j * h / 8
            val o = (ys * w + xs) * 3
            val v = (px(o) + px(o + 1) + px(o + 2)).toLong
            gray(j * 8 + i) = v; tot += v
            i += 1
          }
          j += 1
        }
        var lo = 0L; var hi = 0L
        var p = 0
        while (p < 64) {
          if (64L * gray(p) > tot) {
            if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
          }
          p += 1
        }
        PHashRow(docId, hi, lo, valid = true)
    }

  /** X29f — REAL pixel decode end-to-end: build genuine deflate-
    * compressed filtered PNGs, decode them back per-partition (inflate +
    * unfilter + channel sums), quarantine corrupt streams. The oracle
    * replays the pixel formulas from the id, so a bug anywhere in the
    * filter/deflate round-trip breaks the hash. */
  def x29fPixelStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
    ids.mapPartitions(_.map(id => decodePngStats(id, buildPngImage(id))))
      .toDF()
      .select(col("doc_id"),
        when(col("valid"), col("width")).as("width"),
        when(col("valid"), col("height")).as("height"),
        when(col("valid"), col("n_px")).as("n_px"),
        when(col("valid"), col("sum_r")).as("sum_r"),
        when(col("valid"), col("sum_g")).as("sum_g"),
        when(col("valid"), col("sum_b")).as("sum_b"),
        col("valid"))
      .orderBy(col("doc_id"))
  }

  /** PCM sample formula shared by the WAV builder and the oracle:
    * deterministic in (doc_id, frame, channel), full 16-bit range. */
  @inline private def pcmSample(id: Long, frame: Long, ch: Int): Int =
    (((frame * 773L + id * 131L + ch * 37L) % 65536L) - 32768L).toInt

  @inline private def wavSampleCount(id: Long): Long = 100L + (id % 200)

  /** Build a REAL PCM WAV: the [[buildWavPayload]] header layout but with
    * the data chunk actually carrying 16-bit-LE interleaved samples from
    * [[pcmSample]]. Every 5th id keeps the non-PCM format tag (the
    * compressed-audio quarantine case). */
  def buildWavPcm(docId: Long): Array[Byte] = {
    val rates = Array(8000, 16000, 22050, 44100)
    val rate = rates((docId % 4).toInt)
    val ch = 1 + (docId % 2).toInt
    val bits = 16
    val align = ch * bits / 8
    val nSamples = wavSampleCount(docId)
    val dataLen = nSamples * align
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(if (docId % 5 == 0) 85 else 1) // 85 = MP3-in-WAV: quarantine
    le16(ch); le32(rate); le32(rate.toLong * align); le16(align); le16(bits)
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    var frame = 0L
    while (frame < nSamples) {
      var c = 0
      while (c < ch) { le16(pcmSample(docId, frame, c) & 0xffff); c += 1 }
      frame += 1
    }
    out.toByteArray
  }

  /** Typed row of REAL PCM sample statistics: integer sum-of-squares
    * (RMS² · n), absolute peak, and near-full-scale count (|s| ≥ 32256,
    * the clipping-fraction numerator) — all exact integers so the oracle
    * hash-compares. */
  final case class PcmStats(doc_id: Long, n_samples: Long, sum_sq: Long,
      peak: Int, n_clipped: Long, valid: Boolean)

  /** REAL WAV PCM decode: chunk-walk via the [[parseWavHeader]] logic,
    * then read the data chunk as interleaved 16-bit-LE signed samples and
    * reduce to (sum of squares, peak, clipped count). The metadata-only
    * path ([[x29eAudioMeta]]) never touches sample bytes; this is the
    * feature-extraction stage that does. Truncated data (declared size
    * beyond the payload) quarantines. */
  def decodeWavPcm(docId: Long, b: Array[Byte]): PcmStats = {
    val bad = PcmStats(docId, 0L, 0L, 0, 0L, valid = false)
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      if (i + 4 <= b.length) new String(b.slice(i, i + 4), "US-ASCII") else ""
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return bad
    var i = 12L
    var fmt: Option[(Int, Int)] = None // channels, blockAlign
    var data: Option[(Int, Long)] = None // offset, declared byte length
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val ii = i.toInt
      val id = tag(ii)
      val len = le32(ii + 4)
      if (id == "fmt ") {
        if (len < 16 || i + 8 + 16 > b.length) return bad
        if (le16(ii + 8) != 1) return bad // PCM only
        val ch = le16(ii + 10); val bits = le16(ii + 22); val align = le16(ii + 20)
        if (ch <= 0 || bits != 16 || align != ch * 2) return bad
        fmt = Some((ch, align))
      } else if (id == "data") data = Some((ii + 8, len))
      i += 8L + len + (len & 1L)
    }
    (fmt, data) match {
      case (Some((_, align)), Some((off, declared)))
          if declared % align == 0 && off + declared <= b.length =>
        var sumSq = 0L; var peak = 0; var clipped = 0L
        var j = off
        val end = off + declared.toInt
        while (j < end) {
          val s = le16(j).toShort.toInt // sign-extend 16-bit LE
          sumSq += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          if (a >= 32256) clipped += 1
          j += 2
        }
        PcmStats(docId, declared / 2, sumSq, peak, clipped, valid = true)
      case _ => bad
    }
  }

  /** X29g — REAL PCM sample stats end-to-end: build WAVs carrying actual
    * interleaved 16-bit samples, decode and reduce per-partition. Oracle
    * replays [[pcmSample]] from the id. */
  def x29gPcmStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
    ids.mapPartitions(_.map(id => decodeWavPcm(id, buildWavPcm(id))))
      .toDF()
      .select(col("doc_id"),
        when(col("valid"), col("n_samples")).as("n_samples"),
        when(col("valid"), col("sum_sq")).as("sum_sq"),
        when(col("valid"), col("peak")).as("peak"),
        when(col("valid"), col("n_clipped")).as("n_clipped"),
        col("valid"))
      .orderBy(col("doc_id"))
  }

  /** X108 — image near-dup over REAL decoded pixels: aHash each PNG
    * ([[decodePngAHash]]), then find Hamming-≤3 pairs EXACTLY by
    * pigeonhole banding — 4 bands of 16 bits; any pair within distance 3
    * shares at least one identical band, so the band-equality join has
    * full recall and the ≤3 filter makes it exact (x86's SimHash trick,
    * here on image hashes). Output: every valid doc with its hash and
    * its near-dup degree + smallest partner.
    *
    * Scale shape: the corpus is reduced to 2 Longs per image at the
    * decode stage (pixels never shuffle); the candidate join shuffles
    * only (band, hash) rows and bucket sizes are bounded by hash
    * collision structure, never n². No brute-force pair scan anywhere. */
  def x108ImagePhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
    val hashes = ids
      .mapPartitions(_.map(id => decodePngAHash(id, buildPngImage(id))))
      .toDF().where(col("valid"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"))
    val banded = hashes.select(col("doc_id"), col("hash_hi"), col("hash_lo"),
      posexplode(array(
        col("hash_lo").bitwiseAND(lit(65535L)),
        shiftright(col("hash_lo"), 16),
        col("hash_hi").bitwiseAND(lit(65535L)),
        shiftright(col("hash_hi"), 16))).as(Seq("band_idx", "band_val")))
    val lhs = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("a_id"), col("hash_hi").as("a_hi"), col("hash_lo").as("a_lo"))
    val rhs = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("b_id"), col("hash_hi").as("b_hi"), col("hash_lo").as("b_lo"))
    val pairs = lhs.join(rhs, Seq("band_idx", "band_val"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (expr("bit_count(a_hi ^ b_hi)") + expr("bit_count(a_lo ^ b_lo)"))
          .cast("long").as("hd"))
      .where(col("hd") <= 3)
      .distinct() // a pair may collide in several bands — count it once
    val perDoc = pairs.select(col("a_id").as("doc_id"), col("b_id").as("partner"))
      .union(pairs.select(col("b_id").as("doc_id"), col("a_id").as("partner")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_neardup"), min("partner").as("min_partner"))
    hashes.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        col("min_partner"))
      .orderBy(col("doc_id"))
  }

  /** Typed row of per-doc audio segmentation features (all exact ints). */
  final case class AudioSegRow(doc_id: Long, n_windows: Long,
      n_zero_cross: Long, max_win_sumsq: Long, argmax_win: Long,
      valid: Boolean)

  /** REAL WAV segmentation features: chunk-walk + 16-bit-LE decode like
    * [[decodeWavPcm]], but analyzed frame-wise on channel 0 — zero
    * crossings (sign flips between consecutive frames) and per-50-frame
    * window energy (Σs², exact Long), reporting the loudest window and
    * its index (ties → smallest index). The per-sample stats stage
    * (x29g) collapses the whole doc; this is the segment-level feature
    * extraction a speech-curation pass runs. Quarantine as x29g. */
  def decodeWavSegments(docId: Long, b: Array[Byte]): AudioSegRow = {
    val bad = AudioSegRow(docId, 0L, 0L, 0L, 0L, valid = false)
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      if (i + 4 <= b.length) new String(b.slice(i, i + 4), "US-ASCII") else ""
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return bad
    var i = 12L
    var fmt: Option[Int] = None // blockAlign
    var data: Option[(Int, Long)] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val ii = i.toInt
      val id = tag(ii)
      val len = le32(ii + 4)
      if (id == "fmt ") {
        if (len < 16 || i + 8 + 16 > b.length) return bad
        if (le16(ii + 8) != 1) return bad // PCM only
        val ch = le16(ii + 10); val bits = le16(ii + 22); val align = le16(ii + 20)
        if (ch <= 0 || bits != 16 || align != ch * 2) return bad
        fmt = Some(align)
      } else if (id == "data") data = Some((ii + 8, len))
      i += 8L + len + (len & 1L)
    }
    (fmt, data) match {
      case (Some(align), Some((off, declared)))
          if declared % align == 0 && off + declared <= b.length =>
        val nFrames = (declared / align).toInt
        var prev = 0
        var zc = 0L
        var winSumSq = 0L
        var maxSumSq = -1L; var argmax = 0L
        var f = 0
        while (f < nFrames) {
          val s = le16(off + f * align).toShort.toInt // channel 0
          if (f > 0 && ((prev < 0) != (s < 0))) zc += 1
          winSumSq += s.toLong * s
          if (f % 50 == 49 || f == nFrames - 1) {
            if (winSumSq > maxSumSq) { maxSumSq = winSumSq; argmax = f / 50 }
            winSumSq = 0L
          }
          prev = s
          f += 1
        }
        AudioSegRow(docId, (nFrames + 49L) / 50L, zc,
          if (maxSumSq < 0) 0L else maxSumSq, argmax, valid = true)
      case _ => bad
    }
  }

  /** X109 — audio segmentation end-to-end: real PCM WAVs decoded to
    * frame-level channel-0 features per-partition. Oracle replays
    * [[pcmSample]] over (frame) ranges with LAG + windowed Σs². */
  def x109AudioSegments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
    ids.mapPartitions(_.map(id => decodeWavSegments(id, buildWavPcm(id))))
      .toDF()
      .select(col("doc_id"),
        when(col("valid"), col("n_windows")).as("n_windows"),
        when(col("valid"), col("n_zero_cross")).as("n_zero_cross"),
        when(col("valid"), col("max_win_sumsq")).as("max_win_sumsq"),
        when(col("valid"), col("argmax_win")).as("argmax_win"),
        col("valid"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x108_image_phash" -> (x108ImagePhash _),
    "x109_audio_segments" -> (x109AudioSegments _),
    "x29_multimodal_decode" -> (x29Multimodal _),
    "x29b_multimodal_stats" -> (x29bShapeStats _),
    "x29c_frame_sample" -> (x29cFrameSample _),
    "x29d_header_meta" -> (x29dHeaderMeta _),
    "x29e_audio_meta" -> (x29eAudioMeta _),
    "x29f_pixel_stats" -> (x29fPixelStats _),
    "x29g_pcm_stats" -> (x29gPcmStats _))

  val oracles: Map[String, String] = Map(
    // first-principles aHash replay: the oracle recomputes the 8×8
    // nearest-neighbour samples from the pixel formulas, derives the same
    // 64-bit hash (as two 32-bit Longs), and repeats the banding
    // derivation — which is EXACT for Hamming ≤ 3 by pigeonhole, so the
    // engine's banded join and this SQL agree row-for-row
    "x108_image_phash" ->
      """WITH dims AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 3) % 9 AS h
        |  FROM documents WHERE doc_id % 7 <> 0),
        |ii AS (SELECT doc_id, w, h, unnest(range(8)) AS i FROM dims),
        |ij AS (SELECT doc_id, w, h, i, unnest(range(8)) AS j FROM ii),
        |gr AS (
        |  SELECT doc_id, j*8 + i AS p,
        |    ((xs*7 + ys*13 + doc_id) % 256) + ((xs*3 + ys*5 + 2*doc_id) % 256)
        |      + ((xs*11 + ys + 3*doc_id) % 256) AS gray
        |  FROM (SELECT doc_id, i, j, (i*w)//8 AS xs, (j*h)//8 AS ys FROM ij)),
        |tot AS (SELECT doc_id, sum(gray) AS total FROM gr GROUP BY 1),
        |hs AS (
        |  SELECT g.doc_id,
        |    CAST(coalesce(sum(CASE WHEN 64*gray > total AND p >= 32
        |      THEN 1::BIGINT << (p-32) END), 0) AS BIGINT) AS hash_hi,
        |    CAST(coalesce(sum(CASE WHEN 64*gray > total AND p < 32
        |      THEN 1::BIGINT << p END), 0) AS BIGINT) AS hash_lo
        |  FROM gr g JOIN tot t ON g.doc_id = t.doc_id GROUP BY 1),
        |bands AS (
        |  SELECT doc_id, hash_hi, hash_lo, b AS band_idx,
        |    CASE b WHEN 0 THEN hash_lo & 65535 WHEN 1 THEN hash_lo >> 16
        |           WHEN 2 THEN hash_hi & 65535 ELSE hash_hi >> 16 END AS band_val
        |  FROM hs, (SELECT unnest(range(4)) AS b)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        |      AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.hash_hi, b.hash_hi))
        |      + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
        |per_doc AS (
        |  SELECT doc_id, count(*) AS n_neardup, min(partner) AS min_partner
        |  FROM (SELECT a_id AS doc_id, b_id AS partner FROM pairs
        |        UNION ALL SELECT b_id, a_id FROM pairs)
        |  GROUP BY 1)
        |SELECT h.doc_id, h.hash_hi, h.hash_lo,
        |  CAST(coalesce(p.n_neardup, 0) AS BIGINT) AS n_neardup,
        |  p.min_partner
        |FROM hs h LEFT JOIN per_doc p ON h.doc_id = p.doc_id
        |ORDER BY h.doc_id""".stripMargin,
    // segment-feature replay: channel-0 sample formula over frame ranges,
    // LAG for sign flips, frame//50 windows for energy, argmax by
    // (sumsq DESC, win ASC)
    "x109_audio_segments" ->
      """WITH p AS (
        |  SELECT doc_id, (doc_id % 5 = 0) AS q, 100 + doc_id % 200 AS ns
        |  FROM documents),
        |fr AS (SELECT doc_id, q, ns, unnest(range(ns)) AS f FROM p),
        |v AS (SELECT doc_id, q, ns, f,
        |        ((f*773 + doc_id*131) % 65536) - 32768 AS s
        |      FROM fr),
        |l AS (SELECT doc_id, q, ns, f, s,
        |        lag(s) OVER (PARTITION BY doc_id ORDER BY f) AS ps
        |      FROM v),
        |zc AS (SELECT doc_id, any_value(ns) AS ns,
        |        sum(CASE WHEN ps IS NOT NULL AND ((ps < 0) <> (s < 0))
        |            THEN 1 ELSE 0 END) AS n_zero_cross
        |      FROM l GROUP BY 1),
        |wi AS (SELECT doc_id, f // 50 AS win, sum(s*s) AS sumsq
        |      FROM v GROUP BY 1, 2),
        |mx AS (SELECT doc_id, win, sumsq,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY sumsq DESC, win) AS rn
        |      FROM wi)
        |SELECT p.doc_id,
        | CASE WHEN q THEN NULL ELSE CAST((p.ns + 49) // 50 AS BIGINT) END AS n_windows,
        | CASE WHEN q THEN NULL ELSE CAST(z.n_zero_cross AS BIGINT) END AS n_zero_cross,
        | CASE WHEN q THEN NULL ELSE CAST(m.sumsq AS BIGINT) END AS max_win_sumsq,
        | CASE WHEN q THEN NULL ELSE CAST(m.win AS BIGINT) END AS argmax_win,
        | NOT q AS valid
        |FROM p
        |JOIN zc z ON p.doc_id = z.doc_id
        |JOIN mx m ON p.doc_id = m.doc_id AND m.rn = 1
        |ORDER BY p.doc_id""".stripMargin,
    "x29_multimodal_decode" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        | CAST(32 + doc_id % 96 AS INTEGER) AS width,
        | CAST(32 + (doc_id // 2) % 96 AS INTEGER) AS height,
        | 3 AS channels,
        | CAST(octet_length(encode(text)) // 64 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x29b_multimodal_stats" ->
      """SELECT lang, (32 + doc_id % 96) >= 80 AS is_wide, count(*) AS n,
        | CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
        | CAST(sum(CAST(octet_length(encode(text)) // 64 AS BIGINT)) AS BIGINT) AS total_frames
        |FROM documents GROUP BY 1, 2 ORDER BY lang, is_wide""".stripMargin,
    // first-principles replay of the builder arithmetic: the Spark side
    // PARSES real header bytes, the oracle recomputes what the builder
    // encoded from the id alone — agreement proves the byte round-trip
    "x29d_header_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 7 = 0 THEN 'unknown'
        |      WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      ELSE CAST(32 + doc_id % 96 AS INTEGER) END AS width,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      ELSE CAST(32 + (doc_id // 2) % 96 AS INTEGER) END AS height,
        | (doc_id % 7 <> 0) AS valid
        |FROM documents ORDER BY doc_id""".stripMargin,
    // audio twin of the x29d replay: the Spark side chunk-walks real
    // RIFF bytes, the oracle recomputes the builder's id arithmetic
    "x29e_audio_meta" ->
      """WITH p AS (
        |  SELECT doc_id, (doc_id % 5 = 0) AS quarantined,
        |    CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |                    WHEN 2 THEN 22050 ELSE 44100 END AS rate,
        |    100 + doc_id % 1000 AS n_samples
        |  FROM documents)
        |SELECT doc_id,
        | CASE WHEN quarantined THEN NULL ELSE CAST(rate AS INTEGER) END AS sample_rate,
        | CASE WHEN quarantined THEN NULL ELSE CAST(1 + doc_id % 2 AS INTEGER) END AS channels,
        | CASE WHEN quarantined THEN NULL ELSE CAST(n_samples AS BIGINT) END AS n_samples,
        | CASE WHEN quarantined THEN NULL
        |      ELSE CAST(n_samples * 1000 // rate AS BIGINT) END AS duration_ms,
        | NOT quarantined AS valid
        |FROM p ORDER BY doc_id""".stripMargin,
    "x29c_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) // 64 AS n_frames
        |  FROM documents
        |  WHERE octet_length(encode(text)) // 64 > 0)
        |SELECT doc_id,
        | CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx,
        | CAST(unnest(range(0, n_frames, 4)) * 64 AS INTEGER) AS byte_offset,
        | 64 AS frame_bytes
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
    // first-principles replay of the PIXEL formulas: Spark inflates and
    // unfilters real deflate-compressed scanlines; the oracle recomputes
    // per-pixel values from (doc_id, x, y) alone and sums them
    "x29f_pixel_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 3) % 9 AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM dims),
        |px AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs),
        |st AS (
        |  SELECT doc_id, w, h, count(*) AS n_px,
        |    sum((x*7 + y*13 + doc_id) % 256) AS sum_r,
        |    sum((x*3 + y*5 + 2*doc_id) % 256) AS sum_g,
        |    sum((x*11 + y + 3*doc_id) % 256) AS sum_b
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id,
        | CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(w AS INTEGER) END AS width,
        | CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(h AS INTEGER) END AS height,
        | CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(n_px AS BIGINT) END AS n_px,
        | CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(sum_r AS BIGINT) END AS sum_r,
        | CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(sum_g AS BIGINT) END AS sum_g,
        | CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(sum_b AS BIGINT) END AS sum_b,
        | (doc_id % 7 <> 0) AS valid
        |FROM st ORDER BY doc_id""".stripMargin,
    // PCM twin: Spark reads real interleaved 16-bit-LE sample bytes; the
    // oracle replays the sample formula over (frame, channel) ranges
    "x29g_pcm_stats" ->
      """WITH p AS (
        |  SELECT doc_id, (doc_id % 5 = 0) AS q, 1 + doc_id % 2 AS ch,
        |    100 + doc_id % 200 AS ns
        |  FROM documents),
        |fr AS (SELECT doc_id, q, ch, unnest(range(ns)) AS i FROM p),
        |sa AS (SELECT doc_id, q, i, unnest(range(ch)) AS c FROM fr),
        |v AS (SELECT doc_id, q,
        |        ((i*773 + doc_id*131 + c*37) % 65536) - 32768 AS s
        |      FROM sa),
        |st AS (
        |  SELECT doc_id, q, count(*) AS n, sum(s*s) AS sum_sq,
        |    max(abs(s)) AS peak,
        |    sum(CASE WHEN abs(s) >= 32256 THEN 1 ELSE 0 END) AS n_clipped
        |  FROM v GROUP BY 1, 2)
        |SELECT doc_id,
        | CASE WHEN q THEN NULL ELSE CAST(n AS BIGINT) END AS n_samples,
        | CASE WHEN q THEN NULL ELSE CAST(sum_sq AS BIGINT) END AS sum_sq,
        | CASE WHEN q THEN NULL ELSE CAST(peak AS INTEGER) END AS peak,
        | CASE WHEN q THEN NULL ELSE CAST(n_clipped AS BIGINT) END AS n_clipped,
        | NOT q AS valid
        |FROM st ORDER BY doc_id""".stripMargin)
}
