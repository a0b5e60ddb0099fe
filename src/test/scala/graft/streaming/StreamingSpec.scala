package graft.streaming

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Streaming ops driven to completion with the memory sink and compared
  * against their batch twins on the same data (SURVEY.md §5.2 e2e
  * strategy: a batch of parquet drives the streaming query synchronously). */
class StreamingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def batchEvents = Tables.events(spark, dir)

  /** The batch twin of StreamingOps.purchaseSignupJoin — ONE definition
    * shared by both stream-vs-batch tests so the semantics can't
    * silently diverge between them. */
  private def batchIntervalJoin = {
    val ev = batchEvents
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val sgn = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("event_id").as("signup_id"),
        col("ts").as("s_ts"))
    p.join(sgn,
        col("user_id") === col("s_user_id") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("signup_id"), col("user_id"))
      .orderBy("purchase_id", "signup_id")
  }

  test("watermarked tumbling window agg equals the batch aggregation") {
    val q = StreamingOps.windowedCounts(StreamingOps.eventsStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_out")
      .orderBy("window_start_ms", "event_type").collect()
    val batch = batchEvents
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"))
      .orderBy("window_start_ms", "event_type").collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("session windows produce bounded sessions per user") {
    val q = StreamingOps.sessionCounts(StreamingOps.eventsStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sess_out").collect()
    assert(sessions.nonEmpty)
    // total events across sessions == total events
    assert(sessions.map(_.getLong(2)).sum == batchEvents.count())
  }

  test("dropDuplicatesWithinWatermark keeps one event per key") {
    val q = StreamingOps.dedupWithinWatermark(StreamingOps.eventsStream(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("dedup_out").count()
    val distinctKeys = batchEvents.select("user_id", "event_type").distinct().count()
    assert(n == distinctKeys)
  }

  test("stream-static join enriches against a broadcast batch dimension") {
    val dim = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("hist_n"))
    val q = StreamingOps.enrichAgainstStatic(
        StreamingOps.eventsStream(spark, dir), dim)
      .select("event_id", "user_id", "hist_n")
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("enrich_out")
    assert(out.count() == batchEvents.count())
    assert(out.filter(col("hist_n").isNull).count() == 0)
  }

  test("stream-stream interval join matches the batch interval join") {
    val q = StreamingOps.purchaseSignupJoin(StreamingOps.eventsStream(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssj_out")
      .orderBy("purchase_id", "signup_id").collect()
    val batch = batchIntervalJoin.collect()
    assert(batch.nonEmpty && streamed.sameElements(batch))
  }

  test("x42 gate binding equals the batch interval join and is stable") {
    val gate = StreamingOps.x42StreamJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = batchIntervalJoin
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gate.nonEmpty && gate.sameElements(batch))
    // second construction serves from the per-app cache, same rows
    assert(StreamingOps.x42StreamJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sameElements(gate))
  }

  test("x43 transformWithState completion equals the batch per-user aggregate") {
    val gate = StreamingOps.x43TransformWithState(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = batchEvents
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), unix_millis(max(col("ts"))).as("hw"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gate.nonEmpty && gate.sameElements(batch))
    // the provider conf is restored after the gate ran (getOption
    // surfaces the session DEFAULT — HDFS-backed — not the RocksDB
    // override the gate set for its own query)
    val prov = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    assert(!prov.exists(_.contains("RocksDB")), prov.toString)
  }

  test("flatMapGroupsWithState sessions are exactly batch gaps-and-islands sessions") {
    val q = StreamingOps.sessionsWithState(spark, StreamingOps.eventsStream(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("fsess_out").start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("fsess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch truth: the q22 gaps-and-islands sessions on the same data
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ms"))
    val batchSessions = batchEvents
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("new_s",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > 1800000L, 1)
          .otherwise(when(lag(col("ts_ms"), 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_ms")).as("s"), max(col("ts_ms")).as("e"), count(lit(1)).as("n"))
      .select("user_id", "s", "e", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // every emitted session is a true session; open sessions at end of
    // input may legitimately be unemitted (timeout not yet passed)
    assert(emitted.nonEmpty)
    assert(emitted.subsetOf(batchSessions),
      s"phantom sessions: ${emitted -- batchSessions}")
    // exactly the sessions the final watermark froze must have closed: a
    // session may only emit once no admissible late event could still
    // extend or bridge it (end + gap <= watermark); anything newer stays
    // open by design — eager closing emits split sessions that an
    // in-watermark bridge event later proves wrong
    val finalWmMs = batchEvents
      .agg(max(unix_millis(col("ts")))).first().getLong(0) - 1800000L
    val mustClose = batchSessions.filter(s => s._3 + 1800000L <= finalWmMs)
    assert(mustClose.nonEmpty)
    assert(mustClose.subsetOf(emitted),
      s"unclosed frozen sessions: ${mustClose -- emitted}")
  }

  test("flatMapGroupsWithState merges a late-but-in-watermark event downward") {
    // batch 1: user 1 @ 12:00 opens [12:00,12:00]; batch 2 delivers 11:35
    // (inside the 30-min watermark) — the session must extend DOWNWARD to
    // [11:35,12:00], not regress its end; batches 3-4 advance the
    // watermark via another user so the timeout closes and emits it
    val dir = java.nio.file.Files.createTempDirectory("late_sess")
    def writeF(name: String, mod: Long, rows: String*): Unit = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(mod)
    }
    writeF("a.jsonl", 10000L, """{"u":1,"t":"2024-01-01T12:00:00Z"}""")
    writeF("b.jsonl", 20000L, """{"u":1,"t":"2024-01-01T11:35:00Z"}""")
    writeF("c.jsonl", 30000L, """{"u":99,"t":"2024-01-01T15:00:00Z"}""")
    writeF("d.jsonl", 40000L, """{"u":99,"t":"2024-01-01T15:01:00Z"}""")
    val events = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(dir.toString)
      .select(
        get_json_object(col("value"), "$.u").cast("long").as("user_id"),
        try_to_timestamp(get_json_object(col("value"), "$.t")).as("ts"))
    val q = StreamingOps.sessionsWithState(spark, events)
      .writeStream.outputMode("append").format("memory").queryName("late_out").start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("late_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val t1135 = java.time.Instant.parse("2024-01-01T11:35:00Z").toEpochMilli
    val t1200 = java.time.Instant.parse("2024-01-01T12:00:00Z").toEpochMilli
    assert(emitted.contains((1L, t1135, t1200, 2L)),
      s"late event not merged downward; emitted: $emitted")
  }

  test("flatMapGroupsWithState: an in-watermark bridge event unifies two islands") {
    // batch 1: user 1 @ 12:00 and @ 12:31 — 31 min apart, two islands.
    // batch 2: 12:15 (inside the watermark) BRIDGES them: the correct
    // result is ONE session [12:00,12:31] n=3; eagerly closing the older
    // island in batch 1 would instead emit [12:00,12:00] n=1 and later a
    // phantom [12:15,12:31] n=2. Batches 3-4 advance the watermark so the
    // merged session times out and emits.
    val dir = java.nio.file.Files.createTempDirectory("bridge_sess")
    def writeF(name: String, mod: Long, rows: String*): Unit = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(mod)
    }
    writeF("a.jsonl", 10000L,
      """{"u":1,"t":"2024-01-01T12:00:00Z"}""",
      """{"u":1,"t":"2024-01-01T12:31:00Z"}""")
    writeF("b.jsonl", 20000L, """{"u":1,"t":"2024-01-01T12:15:00Z"}""")
    writeF("c.jsonl", 30000L, """{"u":99,"t":"2024-01-01T15:00:00Z"}""")
    writeF("d.jsonl", 40000L, """{"u":99,"t":"2024-01-01T15:01:00Z"}""")
    val events = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(dir.toString)
      .select(
        get_json_object(col("value"), "$.u").cast("long").as("user_id"),
        try_to_timestamp(get_json_object(col("value"), "$.t")).as("ts"))
    val q = StreamingOps.sessionsWithState(spark, events)
      .writeStream.outputMode("append").format("memory").queryName("bridge_out").start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("bridge_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val t1200 = java.time.Instant.parse("2024-01-01T12:00:00Z").toEpochMilli
    val t1231 = java.time.Instant.parse("2024-01-01T12:31:00Z").toEpochMilli
    val u1 = emitted.filter(_._1 == 1L)
    assert(u1 == Set((1L, t1200, t1231, 3L)),
      s"bridge event did not unify the islands; emitted for user 1: $u1")
  }

  test("incremental dedup drops known and in-stream-repeated content, keeps novel docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup")
    java.nio.file.Files.write(dir.resolve("docs.jsonl"),
      Seq(
        """{"t":"2024-01-01T00:00:00Z","body":"already ingested text"}""",
        """{"t":"2024-01-01T00:01:00Z","body":"fresh doc one"}""",
        """{"t":"2024-01-01T00:02:00Z","body":"fresh doc one"}""",
        """{"t":"2024-01-01T00:03:00Z","body":"fresh doc two"}""")
        .mkString("\n").getBytes("UTF-8"))
    val known = Seq("already ingested text").toDF("body")
      .select(sha2(col("body"), 256).as("h"))
    val docs = spark.readStream.text(dir.toString)
      .select(
        get_json_object(col("value"), "$['t']").cast("timestamp").as("ts"),
        get_json_object(col("value"), "$['body']").as("body"))
    val q = StreamingOps.incrementalDedup(docs, "ts", "body", known)
      .writeStream.outputMode("append").format("memory").queryName("inc_out").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("inc_out").select("body").as[String].collect().sorted
    assert(kept.toSeq == Seq("fresh doc one", "fresh doc two"))
  }

  test("mapGroupsWithState running per-user counts match batch groupBy") {
    val q = StreamingOps.runningUserState(spark, StreamingOps.eventsStream(spark, dir))
      .writeStream.outputMode("update").format("memory").queryName("state_out").start()
    q.processAllAvailable(); q.stop()
    // last update per user wins
    val fin = spark.table("state_out")
      .groupBy("user_id").agg(max("n_events").as("n"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(fin.sameElements(batch))
  }

  test("redelivered stream deduplicates to exactly the original event set") {
    val got = StreamingOps.x75StreamDedupRedelivery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = batchEvents
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every event exactly once: doubling then deduplicating is identity
    assert(got.length == want.length && got.sameElements(want))
  }

  test("stream-static enrich equals the batch inner join against the dimension") {
    val got = StreamingOps.x87StreamStaticEnrich(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = batchEvents.select(col("event_id"), col("user_id"))
      .join(graft.Tables.t(spark, dir, "documents")
        .select(col("doc_id"), col("source")),
        col("user_id") === col("doc_id"))
      .select(col("event_id"), col("user_id"), col("source"))
      .orderBy(col("event_id"), col("user_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == want.length && got.sameElements(want))
    assert(got.nonEmpty, "the fixture user ids must hit the dimension")
  }

  test("streaming online funnel converges to the batch event-time funnel") {
    val steps = Seq("view", "click", "purchase")
    val q = StreamingOps.funnelWithState(spark,
        StreamingOps.eventsStream(spark, dir), steps)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_out").start()
    q.processAllAvailable(); q.stop()
    // the last emitted progress per user is the final state; the fixture
    // stream arrives in event-time order, so online == event-time-exact
    val fin = spark.table("funnel_out")
      .groupBy("user_id")
      .agg(max(struct(col("reached"), col("t_ms"))).as("s"))
      .select(col("user_id"), col("s.reached"), col("s.t_ms"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toList))
    // bind to the REGISTERED oracle-green query, not a re-invocation of
    // the batch function with spelled-out params: the assertion chain is
    // then streaming == q27_funnel == its DuckDB oracle
    val batch = graft.SparkEntry.queries("q27_funnel")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        (2 to 4).flatMap(i => if (r.isNullAt(i)) None else Some(r.getLong(i))).toList))
    assert(fin.nonEmpty && fin.sameElements(batch))
  }

  test("left-outer stream join withholds nulls until the watermark proves them") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // a realistic epoch base: an event AT the initial watermark (0)
    // would be dropped by late-row filtering before it ever reached
    // join state
    val base = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val q = StreamingOps.purchaseSignupLeftJoin(
        mem.toDS().toDF("event_id", "user_id", "event_type", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("loj_spec").start()
    try {
      // user 1: signup then purchase 30 min later (matched pair);
      // user 2: purchase with no signup anywhere (the null row)
      mem.addData(Seq((10L, 1L, "signup", ts(0L)),
        (11L, 1L, "purchase", ts(30L * 60000L)),
        (12L, 2L, "purchase", ts(30L * 60000L))))
      q.processAllAvailable()
      val after1 = spark.table("loj_spec").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      // the unmatched purchase is WITHHELD — an admissible signup could
      // still arrive, so its null row must NOT appear yet (Spark 4 also
      // defers the matched pair to watermark finalization, hence the
      // subset assertion rather than equality)
      assert(after1.toSet.subsetOf(Set((11L, 10L))))
      assert(!after1.contains((12L, -1L)))
      // sentinel pair far past expiry: the no-data batch emits the null
      val sTs = ts(30L * 60000L +
        StreamingOps.JoinIntervalMs + 2 * StreamingOps.JoinDelayMs + 1000L)
      mem.addData(Seq((-1L, -1L, "purchase", sTs), (-2L, -1L, "signup", sTs)))
      q.processAllAvailable()
      val after2 = spark.table("loj_spec").filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(after2.toSet == Set((11L, 10L), (12L, -1L)))
    } finally { q.stop(); spark.catalog.dropTempView("loj_spec") }
  }

  test("chained dedup->window pipeline dedupes across batches before counting") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L // past the initial watermark (see x101 spec)
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.dedupedWindowCounts(
        mem.toDS().toDF("event_id", "event_type", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("chain_spec").start()
    try {
      val e1 = (1L, "A", ts(0L)); val e2 = (2L, "A", ts(60000L))
      mem.addData(Seq(e1, e1, e2, e2)) // in-batch redelivery
      q.processAllAvailable()
      mem.addData(Seq(e1, (3L, "B", ts(0L)))) // cross-batch redelivery + new
      q.processAllAvailable()
      mem.addData(Seq((-1L, "A", ts(4 * 1800000L)))) // flush sentinel
      q.processAllAvailable()
      val got = spark.table("chain_spec")
        .filter(col("window_start_ms") <= base + 60000L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      // one 15-min window; every redelivery collapsed BEFORE the count
      val w0 = (base / 900000L) * 900000L
      assert(got == Set((w0, "A", 2L), (w0, "B", 1L)))
    } finally { q.stop(); spark.catalog.dropTempView("chain_spec") }
  }

  test("union of two watermarked sources finalizes on the MIN watermark only") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // aligned to a 15-min boundary so offset/15min IS the window index
    val base = 1700000100000L
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    def w(min: Long) = base + (min / 15L) * 900000L
    val memA = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val memB = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.unionWindowCounts(
        memA.toDS().toDF("event_id", "event_type", "ts"),
        memB.toDS().toDF("event_id", "event_type", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("union_spec").start()
    try {
      // A races ahead to minute 120; B has produced nothing yet
      memA.addData(Seq((0L, "view", ts(1)), (2L, "view", ts(16)),
        (4L, "view", ts(120))))
      q.processAllAvailable()
      // A's own watermark (min 90) would flush five windows; the global
      // min (B at the initial watermark) must hold ALL of them back
      assert(spark.table("union_spec").count() == 0)
      // B catches up to minute 50 → global wm = min(90, 20) = minute 20:
      // exactly window [0,15) may flush — [15,30) (A@16) must still wait
      memB.addData(Seq((1L, "view", ts(2)), (3L, "view", ts(50))))
      q.processAllAvailable()
      val mid = spark.table("union_spec").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(mid == Set((w(0), "view", 2L)))
      // sentinels on BOTH sources: everything real flushes
      memA.addData(Seq((-1L, "view", ts(300))))
      memB.addData(Seq((-2L, "view", ts(300))))
      q.processAllAvailable()
      val fin = spark.table("union_spec")
        .filter(col("window_start_ms") <= base + 120L * 60000L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(fin == Set((w(0), "view", 2L), (w(16), "view", 1L),
        (w(50), "view", 1L), (w(120), "view", 1L)))
    } finally { q.stop(); spark.catalog.dropTempView("union_spec") }
  }

  test("quota admission: cross-batch accumulation, timer-only emission, conserved counts") {
    val s2 = spark.newSession()
    import s2.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s2.sqlContext
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = 1700000100000L // 15-min aligned, past the initial watermark
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp)]
    val q = mem.toDS().toDF("event_type", "ts")
      .withWatermark("ts", "30 minutes")
      .select(col("event_type"),
        expr("(unix_millis(ts) div 900000) * 900000").as("win"))
      .as[(String, Long)]
      .groupByKey(identity)
      .transformWithState(new StreamingOps.QuotaProcessor(3L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append)
      .writeStream.outputMode("append").format("memory")
      .queryName("quota_spec").start()
    try {
      mem.addData(Seq(("A", ts(1)), ("A", ts(2)), ("B", ts(3))))
      q.processAllAvailable()
      mem.addData(Seq(("A", ts(4)), ("A", ts(5)), ("A", ts(6)), ("B", ts(7))))
      q.processAllAvailable()
      // over-quota arrivals exist, but NOTHING may emit before the
      // watermark proves the window complete: the timer is the only exit
      assert(s2.table("quota_spec").count() == 0)
      mem.addData(Seq(("A", ts(300))))
      q.processAllAvailable()
      val got = s2.table("quota_spec")
        .filter(col("window_start_ms") === base)
        .collect()
        .map(r => (r.getString(1), (r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      // A: 5 arrivals over two batches → 3 admitted, 2 dropped; B: 2 → all in
      assert(got == Map("A" -> ((5L, 3L, 2L)), "B" -> ((2L, 2L, 0L))))
      // conservation: admitted + dropped = total on every row
      s2.table("quota_spec").collect().foreach { r =>
        assert(r.getLong(3) + r.getLong(4) == r.getLong(2), r.toString)
      }
    } finally { q.stop(); s2.catalog.dropTempView("quota_spec") }
  }

  test("x101 gate equals the batch LEFT join (null rows included)") {
    val gate = StreamingOps.x101StreamLeftJoin(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2)))
    val ev = batchEvents
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val sgn = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"),
        col("event_id").as("signup_id"), col("ts").as("s_ts"))
    val batch = p.join(sgn,
        col("user_id") === col("s_user_id") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("purchase_id"), col("signup_id"), col("user_id"))
      .orderBy("purchase_id", "signup_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2)))
    assert(gate.nonEmpty && gate.sameElements(batch))
    // and the outer path genuinely fired: at least one null row exists
    assert(gate.exists(_._2 == -1L))
  }

  test("IdempotentUpsertSink: id-keyed replay skip, latest-wins, forward-only") {
    val sink = new StreamingOps.IdempotentUpsertSink
    // rows are (event_id, user_id, event_type, ts_ms)
    assert(sink.applyBatch(Seq((10L, 1L, "a", 100L), (11L, 2L, "b", 100L)), 0L))
    assert(sink.snapshot == Map(1L -> ((100L, 10L, "a")),
      2L -> ((100L, 11L, "b"))))
    // replay identity is the BATCH ID, not the content: a replayed id
    // with a DIFFERENT payload must still be skipped wholesale
    assert(!sink.applyBatch(Seq((99L, 1L, "poison", 999L)), 0L))
    assert(sink.snapshot(1L) == ((100L, 10L, "a")))
    // a fresh id applies: older update can't move a key backward,
    // same-ts lower event_id loses, newer wins
    assert(sink.applyBatch(Seq((5L, 1L, "old", 50L), (9L, 2L, "tie", 100L),
      (12L, 2L, "new", 200L)), 1L))
    assert(sink.snapshot == Map(1L -> ((100L, 10L, "a")),
      2L -> ((200L, 12L, "new"))))
  }

  test("x134 gate equals batch argmax per user and is deterministic") {
    val d = "/root/testdata/sf0.001"
    val gate = StreamingOps.defs("x134_upsert_sink")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    val batch = graft.Tables.t(spark, d, "events")
      .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1), r.getString(2)))
    assert(gate.nonEmpty && gate.sameElements(batch))
  }
}
