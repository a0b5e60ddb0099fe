package graft.replay

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

/** End-to-end replay without AWS (SURVEY.md §5.2): a local JSON-lines
  * fixture through the full pipeline into the collecting sender. Asserts
  * ordering, payload byte-equality (incl. forced trailing '\n'),
  * malformed-row drop, suffix skip, seek, and the pacing schedule. */
/** JVM-static sleep recorder: Spark serializes task closures even in local
  * mode, so a captured ArrayBuffer would be mutated on a copy. */
object SleepRecorder {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  val record: Long => Unit = (ms: Long) => { q.add(ms); () }
  def clear(): Unit = q.clear()
  def all: Seq[Long] = {
    val it = q.iterator(); val b = Seq.newBuilder[Long]
    while (it.hasNext) b += it.next().longValue()
    b.result()
  }
}

class ReplayE2ESpec extends SparkSpec {

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("replay_fixture")
    // deliberately out of order within a file + across files; one malformed
    // row; one row missing the attribute; a README.md that must be skipped
    Files.write(dir.resolve("part-b.jsonl"), Seq(
      """{"id":4,"dropoff_datetime":"2024-01-01T00:03:00Z","fare":7.5}""",
      """{"id":3,"dropoff_datetime":"2024-01-01T00:02:00Z"}""",
      """not json at all""",
      """{"id":6,"dropoff_datetime":"2024-01-01T00:05:00Z"}""").mkString("\n").getBytes(UTF_8))
    Files.write(dir.resolve("part-a.jsonl"), Seq(
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z"}""",
      """{"id":0,"no_ts_here":true}""",
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""",
      """{"id":5,"dropoff_datetime":"2024-01-01T00:04:00Z"}""").mkString("\n").getBytes(UTF_8))
    // a VALID event row inside the suffix-skipped file: if the R4 filter
    // ever breaks, this row WOULD parse and change the counts
    Files.write(dir.resolve("README.md"),
      """{"id":99,"dropoff_datetime":"2024-01-01T00:06:00Z"}""".getBytes(UTF_8))
    dir.toString
  }

  private def ids(payloads: Seq[String]): Seq[Int] =
    payloads.map(p => """"id":(\d+)""".r.findFirstMatchIn(p).get.group(1).toInt)

  test("batch replay: order, byte-exact payloads, drops, skip, pacing") {
    val dir = writeFixture()
    val cfg = ReplayConfig(inputPath = dir, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    SleepRecorder.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => 0L, sleeper = SleepRecorder.record)

    val payloads = CollectingSender.payloads
    assert(sent == 6 && payloads.size == 6) // 8 lines - 2 malformed; README skipped
    assert(ids(payloads) == Seq(1, 2, 3, 4, 5, 6)) // event-time order repaired
    assert(payloads.forall(_.endsWith("\n"))) // JsonEvent.java:43-49 semantics
    assert(payloads.head == """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""" + "\n")
    // schedule: events 1 min apart at speedup 60000 → due at 0,1,2,3,4,5 ms
    // from a start of 0; with now pinned at 0 the pacer sleeps exactly that
    assert(SleepRecorder.all == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("seek filters exactly at the boundary (R7, exact not sampled)") {
    val dir = writeFixture()
    val cfg = ReplayConfig(inputPath = dir, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1,
      seek = Some(java.time.Instant.parse("2024-01-01T00:02:00Z")))
    CollectingSender.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sent == 4)
    assert(ids(CollectingSender.payloads) == Seq(3, 4, 5, 6))
  }

  test("streaming replay with AvailableNow drains everything then stops (R14)") {
    val dir = writeFixture()
    // whole directory: the README.md suffix-skip must work in streaming too
    val cfg = ReplayConfig(inputPath = dir, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = StreamingReplay.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    val payloads = CollectingSender.payloads
    assert(sent == 6 && payloads.size == 6)
    assert(payloads.forall(_.endsWith("\n")))
  }

  test("streaming replay repairs cross-micro-batch disorder (R8 watermark reorder)") {
    // one file per micro-batch (maxFilesPerTrigger=1); the lexically-first
    // file holds the LATEST timestamps, so per-batch sorting alone would
    // emit 4,6 before 1,2,3,5 — the reorder buffer must hold them back
    // until the watermark (or the end-of-input drain) passes them
    val dir = Files.createTempDirectory("replay_disorder")
    Files.write(dir.resolve("a-late.jsonl"), Seq(
      """{"id":4,"dropoff_datetime":"2024-01-01T00:03:00Z"}""",
      """{"id":6,"dropoff_datetime":"2024-01-01T00:05:00Z"}""").mkString("\n").getBytes(UTF_8))
    Files.write(dir.resolve("b-early.jsonl"), Seq(
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z"}""",
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""",
      """{"id":5,"dropoff_datetime":"2024-01-01T00:04:00Z"}""").mkString("\n").getBytes(UTF_8))
    Files.write(dir.resolve("c-mid.jsonl"), Seq(
      """{"id":3,"dropoff_datetime":"2024-01-01T00:02:00Z"}""").mkString("\n").getBytes(UTF_8))
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = StreamingReplay.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => (),
      disorderToleranceMs = 600000L, maxFilesPerTrigger = 1)
    assert(sent == 6)
    assert(ids(CollectingSender.payloads) == Seq(1, 2, 3, 4, 5, 6))

    // with a tolerance SMALLER than the actual disorder, events later than
    // the declared horizon may emit out of order (the watermark contract)
    // but are still DELIVERED, never dropped — and each release batch is
    // internally ordered
    CollectingSender.clear()
    val sent2 = StreamingReplay.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => (),
      disorderToleranceMs = 60000L, maxFilesPerTrigger = 1)
    assert(sent2 == 6)
    assert(ids(CollectingSender.payloads).sorted == Seq(1, 2, 3, 4, 5, 6))
  }

  test("compressed input (gzip) decodes by extension (R2)") {
    val dir = Files.createTempDirectory("replay_gz")
    val lines = Seq(
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""",
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z"}""").mkString("\n")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("events.jsonl.gz")))
    gz.write(lines.getBytes(UTF_8)); gz.close()
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sent == 2)
    assert(ids(CollectingSender.payloads) == Seq(1, 2))
  }

  test("pass-through of an over-ceiling block-LZ4 header is flagged; plain text is not") {
    def buf(bytes: Array[Byte]) =
      new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes))
    def be(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val ceiling = 64L * 1024 * 1024
    // internally consistent block-LZ4 lengths, orig just above the ceiling
    val overCeiling = be(ceiling + 1) ++ be(ceiling / 2)
    val b1 = buf(overCeiling)
    assert(FramedLz4Codec.warnIfPlausibleOverCeiling(b1, ceiling))
    // the sniff must not consume the stream (pass-through still replays it)
    assert(b1.readNBytes(8).toSeq == overCeiling.toSeq)
    // plain JSON text: both words decode ~2e9, comp >> orig's bound → quiet
    assert(!FramedLz4Codec.warnIfPlausibleOverCeiling(
      buf("""{"type":"trip"}""".getBytes(UTF_8)), ceiling))
  }

  test("a timestamp attribute name containing a quote fails loudly, not silently") {
    // Spark's JSON path syntax cannot address such a key at all; emitting
    // the path anyway would NULL every extraction and the malformed-row
    // filter would drop the whole input without a trace
    import spark.implicits._
    val lines = Seq("""{"it's":"2024-01-01T00:00:00Z"}""").toDF("value")
    for (bad <- Seq("it's", "a\"b", "a\\b", "drop?off")) {
      val ex = intercept[IllegalArgumentException](Parse.parsed(lines, bad))
      assert(ex.getMessage.contains("cannot address"))
    }
    // the empty name is rejected too — JsonPathParser's field rule is
    // `[^\'\?]+` (nonempty), so $[''] never parses and every row would drop
    intercept[IllegalArgumentException](Parse.parsed(lines, ""))
    // ordinary names (including dots, which bracket form keeps flat) still parse
    assert(Parse.parsed(Seq("""{"a.b":"2024-01-01T00:00:00Z"}""").toDF("value"),
      "a.b").count() == 1)
  }

  test("streaming aggregation recovers from a checkpoint without data loss") {
    // checkpointed windowed counts over the fixture: run, stop mid-way is
    // not forced (AvailableNow drains), so instead restart AFTER new data
    // lands and assert the checkpoint carries state across runs
    val dir = Files.createTempDirectory("ckpt_src")
    val ckpt = Files.createTempDirectory("ckpt_state").toString
    def writeBatch(name: String, ids: Range): Unit =
      Files.write(dir.resolve(name), ids.map(i =>
        s"""{"id":$i,"dropoff_datetime":"2024-01-01T00:0$i:00Z"}""").mkString("\n").getBytes(UTF_8))
    writeBatch("a.jsonl", 0 to 4)

    import org.apache.spark.sql.functions._
    def start() = {
      val lines = spark.readStream.text(dir.toString)
      Parse.parsed(lines, "dropoff_datetime")
        .withWatermark("timestamp", "10 minutes")
        .groupBy(window(col("timestamp"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("complete").format("memory").queryName("ckpt_out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    val q1 = start(); q1.awaitTermination(60000)
    assert(spark.table("ckpt_out").agg(sum("n")).first().getLong(0) == 5)

    writeBatch("b.jsonl", 5 to 8) // new data after the first run stopped
    val q2 = start(); q2.awaitTermination(60000)
    // restart resumed from the checkpoint: old + new rows counted once
    assert(spark.table("ckpt_out").agg(sum("n")).first().getLong(0) == 9)
  }

  test("streaming replay: one oversized file completes under a hard buffer capacity") {
    // 500 shuffled events in a SINGLE file — maxFilesPerTrigger can't bound
    // this; the buffer's hard capacity (readerBufferSize=10) must: rows
    // stream through toLocalIterator and the buffer force-releases oldest
    // past the cap, so driver-held state stays ~10 events at any moment
    val dir = Files.createTempDirectory("replay_fat")
    val rng = new scala.util.Random(7)
    val rows = rng.shuffle((1 to 500).toList).map { i =>
      f"""{"id":$i,"dropoff_datetime":"2024-01-01T${i / 3600}%02d:${(i / 60) % 60}%02d:${i % 60}%02d.000Z"}"""
    }
    Files.write(dir.resolve("fat.jsonl"), rows.mkString("\n").getBytes(UTF_8))
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 3600000L,
      ingestionStartMs = Some(0L), senderParallelism = 2,
      readerBufferSize = 10)
    CollectingSender.clear()
    val sent = StreamingReplay.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => (),
      disorderToleranceMs = Long.MaxValue / 2) // horizon never fires: capacity must
    assert(sent == 500)
    // forced releases may reorder beyond the 10-event horizon, but nothing
    // is ever dropped
    assert(ids(CollectingSender.payloads).sorted == (1 to 500).toList)
  }

  test("framed .json.lz4 input (the reference's default dataset format) replays byte-exactly (R2)") {
    val dir = Files.createTempDirectory("replay_lz4")
    val lines = Seq(
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z","fare":3.25}""",
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z","fare":11.0}""",
      """{"id":3,"dropoff_datetime":"2024-01-01T00:02:00Z"}""")
    val lz4 = new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("taxi-trips.json.lz4")))
    lz4.write(lines.mkString("\n").getBytes(UTF_8)); lz4.close()
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sent == 3)
    val payloads = CollectingSender.payloads
    assert(ids(payloads) == Seq(1, 2, 3))
    // byte-exact: original line + the forced trailing newline, nothing else
    assert(payloads == lines.map(_ + "\n"))
  }

  test("concatenated LZ4 frames decode fully — no silent truncation after frame 1") {
    // `cat a.lz4 b.lz4 > all.lz4` (and chunked writers flushing one frame
    // per chunk) is a valid stream `lz4cat` reads end-to-end; the factory's
    // default stops at the first frame's end-mark and silently drops the
    // rest — data loss with no error raised
    val dir = Files.createTempDirectory("replay_lz4_concat")
    val first = Seq(
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""",
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z"}""")
    val second = Seq(
      """{"id":3,"dropoff_datetime":"2024-01-01T00:02:00Z"}""",
      """{"id":4,"dropoff_datetime":"2024-01-01T00:03:00Z"}""")
    val out = java.nio.file.Files.newOutputStream(dir.resolve("trips.json.lz4"))
    for (chunk <- Seq(first, second)) {
      val f = new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream(out)
      f.write((chunk.mkString("\n") + "\n").getBytes(UTF_8))
      f.finish() // complete frame; next chunk starts a fresh one
    }
    out.close()
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sent == 4) // truncation at frame 1 would read 2
    assert(ids(CollectingSender.payloads) == Seq(1, 2, 3, 4))
  }

  test("suffix skip matches the full path like the reference's key.endsWith — batch and streaming agree") {
    // a suffix spanning '/' (an object-key suffix, e.g. `meta/README.md`)
    // must skip in BOTH paths; a name-only match skips nothing in batch
    // while streaming skips — silently divergent replay sets
    val dir = Files.createTempDirectory("replay_suffix")
    Files.createDirectories(dir.resolve("meta"))
    Files.write(dir.resolve("part-a.jsonl"),
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""".getBytes(UTF_8))
    Files.write(dir.resolve("meta").resolve("README.md"),
      """{"id":99,"dropoff_datetime":"2024-01-01T00:06:00Z"}""".getBytes(UTF_8))
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1,
      objectSuffixToSkip = "meta/README.md")
    CollectingSender.clear()
    val sentBatch = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sentBatch == 1 && ids(CollectingSender.payloads) == Seq(1))
    CollectingSender.clear()
    val sentStream = StreamingReplay.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sentStream == 1 && ids(CollectingSender.payloads) == Seq(1))
    // an empty suffix skips NOTHING (endsWith("") is true of every path —
    // it must not mean "skip everything")
    assert(Source.listFiles(spark, dir.toString, "").size == 2)
  }

  test("block-format .lz4 (Hadoop Lz4Codec wire format) still decodes via the sniffing fallback") {
    val dir = Files.createTempDirectory("replay_lz4_block")
    val lines = Seq(
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""",
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z"}""")
    val hadoopLz4 = new org.apache.hadoop.io.compress.Lz4Codec()
    hadoopLz4.setConf(spark.sparkContext.hadoopConfiguration)
    val out = hadoopLz4.createOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("events.jsonl.lz4")))
    out.write(lines.mkString("\n").getBytes(UTF_8)); out.close()
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sent == 2)
    assert(ids(CollectingSender.payloads) == Seq(1, 2))
  }

  test("zstd content mislabeled .json.lz4 decodes via the magic-byte sniff (R2 breadth)") {
    // the reference detects the COMPRESSOR from content, never the name
    // (CompressorStreamFactory) — so a zstd stream inside a .lz4-named
    // object must decode; exercises the commons-compress breadth claim
    // beyond the two LZ4 wire formats
    val dir = Files.createTempDirectory("replay_zstd")
    val lines = Seq(
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""",
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z"}""")
    val z = new com.github.luben.zstd.ZstdOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("events.json.lz4")))
    z.write(lines.mkString("\n").getBytes(UTF_8)); z.close()
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sent == 2)
    assert(ids(CollectingSender.payloads) == Seq(1, 2))
  }

  test("uncompressed file mislabeled .json.lz4 replays byte-exactly (reference's plain-text fallback)") {
    // the reference's content sniff falls through to "probably just
    // uncompressed" (JsonEventS3Iterator.java:164-166); a plaintext file
    // with an .lz4 name must replay, not throw and get dropped by
    // ignoreCorruptFiles
    val dir = Files.createTempDirectory("replay_lz4_plain")
    val lines = Seq(
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z","fare":2.5}""",
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z"}""")
    Files.write(dir.resolve("mislabeled.json.lz4"),
      lines.mkString("\n").getBytes(UTF_8))
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sent == 2)
    val payloads = CollectingSender.payloads
    assert(ids(payloads) == Seq(1, 2))
    assert(payloads == lines.map(_ + "\n")) // byte-exact pass-through
  }

  test("streaming source also decodes framed .lz4 (codec registered on the shared conf)") {
    val dir = Files.createTempDirectory("replay_lz4_stream")
    val lines = Seq(
      """{"id":1,"dropoff_datetime":"2024-01-01T00:00:00Z"}""",
      """{"id":2,"dropoff_datetime":"2024-01-01T00:01:00Z"}""")
    val lz4 = new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("events.json.lz4")))
    lz4.write(lines.mkString("\n").getBytes(UTF_8)); lz4.close()
    val cfg = ReplayConfig(inputPath = dir.toString, speedupFactor = 60000L,
      ingestionStartMs = Some(0L), senderParallelism = 1)
    CollectingSender.clear()
    val sent = StreamingReplay.run(spark, cfg, new CollectingSender(),
      nowMs = () => Long.MaxValue, sleeper = _ => ())
    assert(sent == 2)
    assert(ids(CollectingSender.payloads) == Seq(1, 2))
  }

  test("fractional speedup 0.5 slows replay to half speed end-to-end") {
    val dir = writeFixture()
    // 0.5 = slow-down: 60s event gaps stretch to 120s of simulated time
    val (cfg0, _) = ReplayCli.parseArgs(Array(
      "-inputPath", dir, "-speedup", "0.5", "-dryRun"))
    val cfg = cfg0.copy(ingestionStartMs = Some(0L), senderParallelism = 1)
    assert(cfg.speedupFactor == 0.5)
    CollectingSender.clear()
    SleepRecorder.clear()
    val sent = ReplayJob.run(spark, cfg, new CollectingSender(),
      nowMs = () => 0L, sleeper = SleepRecorder.record)
    assert(sent == 6)
    assert(ids(CollectingSender.payloads) == Seq(1, 2, 3, 4, 5, 6))
    // events at 0..5 min → due at 0,120000,...,600000 ms from start 0
    assert(SleepRecorder.all == (1 to 5).map(_ * 120000L))
  }

  test("non-positive speedup is rejected at construction, not silently corrupted") {
    intercept[IllegalArgumentException](ReplayConfig(speedupFactor = 0.0))
    intercept[IllegalArgumentException](ReplayConfig(speedupFactor = -1.5))
    intercept[IllegalArgumentException](
      ReplayCli.parseArgs(Array("-speedup", "0")))
  }

  test("CLI parses the reference's option surface (R13)") {
    val (cfg, dry) = ReplayCli.parseArgs(Array(
      "-inputPath", "file:/data/x", "-speedup", "3600",
      "-timestampAttributeName", "ts", "-seek", "2024-01-15T00:00:00Z",
      "-statisticsFrequency", "5000", "-kinesisSenderThreads", "8",
      "-streamArn", "arn:aws:kinesis:us-east-1:123456789012:stream/s1",
      "-dryRun"))
    assert(cfg.inputPath == "file:/data/x" && cfg.speedupFactor == 3600 &&
      cfg.timestampAttributeName == "ts" &&
      cfg.seek.contains(java.time.Instant.parse("2024-01-15T00:00:00Z")) &&
      cfg.statisticsFrequencyMillis == 5000 && cfg.senderParallelism == 8 &&
      cfg.streamArn.endsWith("stream/s1") && dry)
    intercept[IllegalArgumentException](ReplayCli.parseArgs(Array("-streamArn", "bogus")))
    intercept[IllegalArgumentException](ReplayCli.parseArgs(Array("-wat")))
  }
}
