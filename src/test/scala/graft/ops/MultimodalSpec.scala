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
