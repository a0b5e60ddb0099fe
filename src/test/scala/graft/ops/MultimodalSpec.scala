package graft.ops

import graft.SparkSpec

/** The REAL part of the X29 decode path: container-header parsing is
  * public byte-format logic (no codec needed), so it gets direct
  * edge-case coverage — truncation, progressive JPEG, restart markers,
  * zero dims, lying length fields — plus the builder round-trip the
  * oracle also checks. */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
    def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    be32(13); "IHDR".foreach(c => out.write(c)); be32(w); be32(h)
    out.write(8); out.write(2); out.write(0); out.write(0); out.write(0); be32(0)
    out.toByteArray
  }

  private def jpeg(w: Int, h: Int, sof: Int = 0xc0,
      withRestart: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8)
    if (withRestart) { out.write(0xff); out.write(0xd0) } // standalone RSTn
    out.write(0xff); out.write(0xe0); be16(16)
    "JFIF".foreach(c => out.write(c)); (0 until 10).foreach(_ => out.write(0))
    out.write(0xff); out.write(sof); be16(11)
    out.write(8); be16(h); be16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    out.toByteArray
  }

  test("header parser: valid PNG and JPEG round-trip their dimensions") {
    val p = MultimodalOps.parseMediaHeader(1L, png(640, 480))
    assert(p == MultimodalOps.HeaderMeta(1L, "png", 640, 480, valid = true))
    val j = MultimodalOps.parseMediaHeader(2L, jpeg(1920, 1080))
    assert(j == MultimodalOps.HeaderMeta(2L, "jpeg", 1920, 1080, valid = true))
    // progressive JPEG (SOF2) parses too
    val prog = MultimodalOps.parseMediaHeader(3L, jpeg(64, 32, sof = 0xc2))
    assert(prog == MultimodalOps.HeaderMeta(3L, "jpeg", 64, 32, valid = true))
    // standalone restart markers are skipped, not mis-read as sized segments
    val rst = MultimodalOps.parseMediaHeader(4L, jpeg(10, 20, withRestart = true))
    assert(rst == MultimodalOps.HeaderMeta(4L, "jpeg", 10, 20, valid = true))
    // spec-legal 0xff fill/padding bytes between segments are skipped
    val filled = {
      val base = jpeg(48, 24)
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, 2) // SOI
      out.write(0xff); out.write(0xff); out.write(0xff) // fill bytes
      out.write(base, 2, base.length - 2)
      out.toByteArray
    }
    assert(MultimodalOps.parseMediaHeader(5L, filled) ==
      MultimodalOps.HeaderMeta(5L, "jpeg", 48, 24, valid = true))
    // EOI before any frame header ends the scan as invalid, not a crash
    val eoi = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(!MultimodalOps.parseMediaHeader(6L, eoi).valid)
  }

  test("header parser: corrupt, truncated, and lying payloads quarantine") {
    def invalid(b: Array[Byte]): Boolean =
      !MultimodalOps.parseMediaHeader(9L, b).valid
    assert(invalid(Array.emptyByteArray))
    assert(invalid("not an image at all".getBytes("US-ASCII")))
    assert(invalid(png(640, 480).take(12))) // truncated before IHDR
    assert(invalid(png(0, 480))) // zero width
    assert(invalid(jpeg(0, 0))) // zero dims
    assert(invalid(jpeg(64, 64).take(6))) // truncated mid-marker
    // a length field pointing past the payload end must not read OOB
    val lying = jpeg(64, 64)
    lying(4) = 0x7f.toByte // APP0 length high byte := 32k, beyond the buffer
    assert(invalid(lying))
    // DHT (C4) is NOT a frame header even though it sits in the C0..CF range
    val dht = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(0xff); out.write(0xd8)
      out.write(0xff); out.write(0xc4); out.write(0); out.write(3); out.write(0)
      out.toByteArray
    }
    assert(invalid(dht))
  }

  test("wav parser: PCM headers round-trip; non-PCM, truncation, misalignment quarantine") {
    // well-formed via the builder (ids avoiding the %5 quarantine)
    val ok = MultimodalOps.parseWavHeader(3L, MultimodalOps.buildWavPayload(3L))
    assert(ok.valid && ok.sample_rate == 44100 && ok.channels == 2 &&
      ok.n_samples == 103L && ok.duration_ms == 103L * 1000 / 44100)
    // non-PCM format tag (the builder's %5 branch) quarantines
    assert(!MultimodalOps.parseWavHeader(5L, MultimodalOps.buildWavPayload(5L)).valid)
    // structural damage
    val good = MultimodalOps.buildWavPayload(1L)
    assert(!MultimodalOps.parseWavHeader(9L, good.take(11)).valid) // truncated RIFF
    assert(!MultimodalOps.parseWavHeader(9L, Array.emptyByteArray).valid)
    val notWave = good.clone(); notWave(8) = 'X'.toByte
    assert(!MultimodalOps.parseWavHeader(9L, notWave).valid)
    // data size not a multiple of block align ⇒ inconsistent ⇒ quarantine
    val misaligned = good.clone()
    misaligned(good.length - 4) = ((good(good.length - 4) & 0xff) + 1).toByte
    assert(!MultimodalOps.parseWavHeader(9L, misaligned).valid)
    // a chunk the parser doesn't know (LIST) before fmt/data is skipped
    // by its length field, not mis-read
    val withList = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 12) // RIFF..WAVE
      out.write("LIST".getBytes("US-ASCII"))
      out.write(4); out.write(0); out.write(0); out.write(0) // len 4 LE
      out.write("INFO".getBytes("US-ASCII"))
      out.write(good, 12, good.length - 12)
      out.toByteArray
    }
    val viaList = MultimodalOps.parseWavHeader(1L, withList)
    assert(viaList.valid && viaList.sample_rate == 16000 && viaList.channels == 2)
    // two chunks declaring ~1GB each must quarantine, not overflow the
    // cursor into a negative index (the Int-cursor crash class)
    val huge = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(Array(0xff, 0xff, 0xff, 0x7f).map(_.toByte)) // size
      out.write("WAVE".getBytes("US-ASCII"))
      (1 to 2).foreach { _ =>
        out.write("JUNK".getBytes("US-ASCII"))
        out.write(Array(0xff, 0xff, 0xff, 0x3f).map(_.toByte)) // len ~1GB LE
        out.write(0); out.write(0) // a couple of body bytes
      }
      out.toByteArray
    }
    assert(!MultimodalOps.parseWavHeader(9L, huge).valid)
  }

  test("png pixel decode: inflate + all five unfilter paths round-trip the builder") {
    // ids 0..29 cover every (w, h, filter-cycle) combination the builder
    // emits and both the valid and %7-corrupt branches
    (0L to 29L).foreach { id =>
      val st = MultimodalOps.decodePngStats(id, MultimodalOps.buildPngImage(id))
      if (id % 7 == 0) assert(!st.valid, s"id $id should quarantine (corrupt zlib)")
      else {
        assert(st.valid, s"id $id should decode")
        val w = 8 + (id % 9).toInt; val h = 8 + ((id / 3) % 9).toInt
        assert(st.width == w && st.height == h && st.n_px == w.toLong * h, s"id $id dims")
        // recompute the channel sums from the shared pixel formulas
        var sr = 0L; var sg = 0L; var sb = 0L
        for (x <- 0 until w; y <- 0 until h) {
          sr += ((x * 7L + y * 13L + id) % 256)
          sg += ((x * 3L + y * 5L + 2 * id) % 256)
          sb += ((x * 11L + y + 3 * id) % 256)
        }
        assert(st.sum_r == sr && st.sum_g == sg && st.sum_b == sb, s"id $id sums")
      }
    }
  }

  test("png pixel decode: structural damage quarantines, never crashes") {
    val good = MultimodalOps.buildPngImage(1L)
    def invalid(b: Array[Byte]): Boolean = !MultimodalOps.decodePngStats(9L, b).valid
    assert(invalid(Array.emptyByteArray))
    assert(invalid(good.take(20))) // truncated inside IHDR
    val flippedCrc = good.clone(); flippedCrc(good.length - 5) = 0x55
    assert(invalid(flippedCrc)) // IEND CRC mismatch
    val flippedPixel = good.clone()
    flippedPixel(44) = (flippedPixel(44) ^ 0x40).toByte // inside IDAT data
    assert(invalid(flippedPixel)) // IDAT CRC catches payload damage
    // a grayscale IHDR (colour type 0) is out of decode scope → quarantine
    val gray = good.clone(); gray(25) = 0
    assert(invalid(gray)) // (CRC now wrong too — either check quarantines)
    // truncated deflate stream: rebuild with IDAT cut short but CRC valid
    val cut = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 33) // sig + IHDR chunk
      // locate IDAT in the original: sig(8) + IHDR(25) = offset 33
      val idatLen = ((good(33) & 0xff) << 24) | ((good(34) & 0xff) << 16) |
        ((good(35) & 0xff) << 8) | (good(36) & 0xff)
      val short = java.util.Arrays.copyOfRange(good, 41, 41 + idatLen / 2)
      def be32(v: Long): Unit = { out.write(((v >>> 24) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write((v & 0xff).toInt) }
      be32(short.length.toLong)
      out.write("IDAT".getBytes("US-ASCII")); out.write(short, 0, short.length)
      val crc = new java.util.zip.CRC32()
      crc.update("IDAT".getBytes("US-ASCII")); crc.update(short)
      be32(crc.getValue)
      out.toByteArray
    }
    assert(invalid(cut))
    // FDICT (preset-dictionary) zlib stream: inflate() returns 0 with
    // needsDictionary()=true, needsInput()=false, finished()=false — a
    // decoder that only treats needsInput as terminal SPINS FOREVER here.
    // Header 0x78 0x20: CMF=0x78, FLG=0x20 sets the FDICT bit and keeps
    // (CMF·256+FLG) % 31 == 0 as RFC 1950 requires, then the 4-byte
    // DICTID; a valid-CRC IDAT carries it so every structural check
    // upstream passes and the inflate loop itself must bail.
    val fdict = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 33) // sig + IHDR chunk
      val z = Array[Byte](0x78, 0x20, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06)
      def be32(v: Long): Unit = { out.write(((v >>> 24) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write((v & 0xff).toInt) }
      be32(z.length.toLong)
      out.write("IDAT".getBytes("US-ASCII")); out.write(z, 0, z.length)
      val crc = new java.util.zip.CRC32()
      crc.update("IDAT".getBytes("US-ASCII")); crc.update(z)
      be32(crc.getValue)
      out.toByteArray
    }
    assert(invalid(fdict))
  }

  test("wav pcm decode: sample stats round-trip the builder arithmetic") {
    (0L to 14L).foreach { id =>
      val st = MultimodalOps.decodeWavPcm(id, MultimodalOps.buildWavPcm(id))
      if (id % 5 == 0) assert(!st.valid, s"id $id should quarantine (non-PCM)")
      else {
        assert(st.valid, s"id $id should decode")
        val ch = 1 + (id % 2).toInt; val ns = 100L + (id % 200)
        assert(st.n_samples == ns * ch, s"id $id count")
        var sumSq = 0L; var peak = 0; var clipped = 0L
        for (f <- 0L until ns; c <- 0 until ch) {
          val s = (((f * 773L + id * 131L + c * 37L) % 65536L) - 32768L).toInt
          sumSq += s.toLong * s
          peak = math.max(peak, math.abs(s))
          if (math.abs(s) >= 32256) clipped += 1
        }
        assert(st.sum_sq == sumSq && st.peak == peak && st.n_clipped == clipped,
          s"id $id stats")
      }
    }
  }

  test("wav pcm decode: truncated data chunk quarantines") {
    val good = MultimodalOps.buildWavPcm(1L)
    assert(!MultimodalOps.decodeWavPcm(9L, good.take(good.length - 10)).valid)
    assert(!MultimodalOps.decodeWavPcm(9L, good.take(40)).valid)
    // odd declared data size (misaligned) quarantines
    val odd = good.clone(); odd(41) = ((odd(41) & 0xff) + 1).toByte
    assert(!MultimodalOps.decodeWavPcm(9L, odd).valid)
  }

  test("image aHash: hash bits match a brute-force recompute from the pixel formulas") {
    (0L to 20L).foreach { id =>
      val r = MultimodalOps.decodePngAHash(id, MultimodalOps.buildPngImage(id))
      if (id % 7 == 0) assert(!r.valid, s"id $id should quarantine")
      else {
        assert(r.valid, s"id $id should decode")
        val w = 8 + (id % 9).toInt; val h = 8 + ((id / 3) % 9).toInt
        def gray(xs: Int, ys: Int): Long =
          ((xs * 7L + ys * 13L + id) % 256) + ((xs * 3L + ys * 5L + 2 * id) % 256) +
            ((xs * 11L + ys + 3 * id) % 256)
        val g = for (j <- 0 until 8; i <- 0 until 8)
          yield gray(i * w / 8, j * h / 8)
        val tot = g.sum
        var lo = 0L; var hi = 0L
        for (p <- 0 until 64 if 64L * g(p) > tot)
          if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
        assert(r.hash_lo == lo && r.hash_hi == hi, s"id $id hash")
      }
    }
  }

  test("x108 banding is exact: query pairs equal brute-force Hamming<=3 over all hashes") {
    val out = MultimodalOps.x108ImagePhash(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // brute-force over the decoded hashes themselves
    val hs = out.map { case (id, (hi, lo, _, _)) => (id, hi, lo) }.toSeq
    val brute = hs.map { case (a, ahi, alo) =>
      val partners = hs.filter { case (b, bhi, blo) =>
        b != a && java.lang.Long.bitCount(ahi ^ bhi) +
          java.lang.Long.bitCount(alo ^ blo) <= 3
      }.map(_._1)
      (a, (partners.size.toLong, if (partners.isEmpty) -1L else partners.min))
    }.toMap
    assert(out.nonEmpty, "fixture should decode some images")
    out.foreach { case (id, (_, _, n, minP)) =>
      assert((n, minP) == brute(id), s"doc $id pair stats")
    }
    assert(out.values.exists(_._3 > 0) || brute.values.forall(_._1 == 0L),
      "banding must not lose pairs the brute force finds")
  }

  test("wav segments: windowed energy + zero crossings round-trip the builder") {
    (0L to 14L).foreach { id =>
      val r = MultimodalOps.decodeWavSegments(id, MultimodalOps.buildWavPcm(id))
      if (id % 5 == 0) assert(!r.valid, s"id $id should quarantine")
      else {
        assert(r.valid, s"id $id should decode")
        val ns = (100L + (id % 200)).toInt
        def s0(f: Int): Int = (((f * 773L + id * 131L) % 65536L) - 32768L).toInt
        val zc = (1 until ns).count(f => (s0(f - 1) < 0) != (s0(f) < 0)).toLong
        val wins = (0 until ns).groupBy(_ / 50).toSeq
          .map { case (w, fs) => (w.toLong, fs.map(f => s0(f).toLong * s0(f)).sum) }
        val (argmax, mx) = wins.minBy { case (w, ss) => (-ss, w) }
        assert(r.n_windows == (ns + 49) / 50 && r.n_zero_cross == zc &&
          r.max_win_sumsq == mx && r.argmax_win == argmax, s"id $id features")
      }
    }
    // truncated data chunk quarantines rather than mis-decoding
    val good = MultimodalOps.buildWavPcm(1L)
    assert(!MultimodalOps.decodeWavSegments(9L, good.take(good.length - 10)).valid)
  }

  test("builder -> parser round-trip matches the id arithmetic for all branches") {
    val filler = "filler text".getBytes("UTF-8")
    (0L to 20L).foreach { id =>
      val m = MultimodalOps.parseMediaHeader(id,
        MultimodalOps.buildMediaPayload(id, filler))
      if (id % 7 == 0) assert(!m.valid, s"id $id should quarantine")
      else {
        assert(m.valid, s"id $id should parse")
        assert(m.format == (if (id % 2 == 0) "png" else "jpeg"), s"id $id")
        assert(m.width == 32 + (id % 96).toInt && m.height == 32 + ((id / 2) % 96).toInt,
          s"id $id dims")
      }
    }
  }
}
