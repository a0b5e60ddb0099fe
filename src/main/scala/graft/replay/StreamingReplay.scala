package graft.replay

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming form of the replay pipeline (SURVEY.md §2A R8/R14
  * mapping): `readStream` text source → parse → watermark-driven reorder →
  * paced sink.
  *
  * The reference's 100k-event priority-queue reorder buffer
  * (JsonEventBufferedReader.java:39-47) becomes a [[ReorderBuffer]] fed by
  * `foreachBatch`: events are held until the event-time watermark
  * (max seen − disorder tolerance) passes them, then released in event-time
  * order and paced out — so cross-micro-batch disorder up to the tolerance
  * is repaired, not just disorder within one batch. At end of input
  * (`Trigger.AvailableNow` — the reference's drain-termination protocol,
  * RePlayer.java:132-164, without its fill() hang, SURVEY.md §8.1) the
  * buffer drains in order, exactly like the reference's final buffer drain.
  *
  * Architecture note (deliberate, documented boundary): this single shared
  * buffer reproduces the reference's single-node architecture — one ordered
  * stream, N parallel sender lanes pulling contiguous time slices. Pacing
  * rate-limits replay to the simulated clock, so the buffer — not the
  * cluster — is never the throughput bound. The horizontally-scalable form
  * of replay is the batch path ([[ReplayJob]]): a range-partitioned total
  * sort with per-partition pacing and no driver-side state.
  */
object StreamingReplay {

  /** Watermark-driven bounded reorder buffer — the streaming-side
    * equivalent of the reference's priority queue
    * (JsonEventBufferedReader.java:39-47). `release()` pops everything at
    * or below the watermark (max event time seen − tolerance) in
    * (event-time, arrival-seq) order; `drain()` pops the rest at end of
    * input. State is bounded by the events inside the disorder horizon —
    * the same bound the reference enforces by queue capacity. */
  final class ReorderBuffer(toleranceMs: Long) {
    private final case class E(ms: Long, seq: Long, payload: String)
    private val pq = new java.util.PriorityQueue[E]((a: E, b: E) =>
      if (a.ms != b.ms) java.lang.Long.compare(a.ms, b.ms)
      else java.lang.Long.compare(a.seq, b.seq))
    private var maxMs = Long.MinValue
    private var seq = 0L

    def add(ms: Long, payload: String): Unit = synchronized {
      pq.add(E(ms, seq, payload)); seq += 1
      if (ms > maxMs) maxMs = ms
    }
    /** Events whose time has been passed by the watermark, in order. */
    def release(): Vector[(Long, String)] = synchronized {
      if (maxMs == Long.MinValue) Vector.empty
      else popWhile(_.ms <= maxMs - toleranceMs)
    }
    /** End-of-input: everything left, in order. */
    def drain(): Vector[(Long, String)] = synchronized(popWhile(_ => true))
    def size: Int = synchronized(pq.size)

    private def popWhile(p: E => Boolean): Vector[(Long, String)] = {
      val b = Vector.newBuilder[(Long, String)]
      while (!pq.isEmpty && p(pq.peek())) {
        val e = pq.poll(); b += ((e.ms, e.payload))
      }
      b.result()
    }
  }

  /** Streaming scheduled events; the watermark declares the disorder
    * horizon the sink-side [[ReorderBuffer]] enforces. The suffix
    * anti-filter (R4) is applied via input_file_name — readStream has no
    * file-list form, and pathGlobFilter is positive-only — and unreadable
    * objects are skipped (R5) like the batch path. */
  def stream(spark: SparkSession, cfg: ReplayConfig,
      disorderToleranceMs: Long = 600000L,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .option("ignoreCorruptFiles", "true")
      .text(cfg.inputPath)
      .filter(!input_file_name().endsWith(cfg.objectSuffixToSkip))
    Parse.seek(Parse.parsed(lines, cfg.timestampAttributeName), cfg.seek)
      .withWatermark("timestamp", s"$disorderToleranceMs milliseconds")
  }

  /** Paced replay to a [[RecordSender]]. Blocks until the input is drained
    * (AvailableNow) and the reorder buffer is flushed; returns records
    * sent. Events are released from the buffer only once the watermark
    * passes them, paced against the affine schedule anchored at the first
    * released (earliest) event, and sent over `senderParallelism` lanes,
    * each a contiguous time slice (per-lane event-time order, like the
    * batch path). */
  def run(spark: SparkSession, cfg: ReplayConfig, sender: RecordSender,
      nowMs: () => Long = () => System.currentTimeMillis(),
      sleeper: Long => Unit = Thread.sleep,
      disorderToleranceMs: Long = 600000L,
      maxFilesPerTrigger: Int = 16): Long = {
    val startMs = cfg.ingestionStartMs.getOrElse(System.currentTimeMillis())
    val buffer = new ReorderBuffer(disorderToleranceMs)
    // anchor is stateful across micro-batches, like the reference's parser
    val anchorMs = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val sentAcc = spark.sparkContext.longAccumulator("streaming_records_sent")

    def emit(slice: Vector[(Long, String)]): Unit = if (slice.nonEmpty) {
      anchorMs.compareAndSet(Long.MinValue, slice.head._1)
      val a = anchorMs.get()
      val speedup = cfg.speedupFactor
      val scheduled = slice.map { case (ms, payload) =>
        (Schedule.ingestionMs(ms, a, startMs, speedup), ms,
          payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      // contiguous slices per lane: parallelize preserves element order
      // within each partition → per-lane event-time order holds
      spark.sparkContext
        .parallelize(scheduled, math.min(cfg.senderParallelism, slice.size))
        .foreachPartition { (it: Iterator[(Long, Long, Array[Byte])]) =>
          var lastTsMs = 0L // high-water of the record the pacer admitted
          val recs = it.map { case (due, ms, bytes) => lastTsMs = ms; (due, bytes) }
          val (n, _) = Sink.sendScheduled(recs, sender, nowMs, sleeper,
            onPaced = lag => ReplayStats.shared.record(lag, lastTsMs)) // R12
          sentAcc.add(n)
        }
    }

    val query = stream(spark, cfg, disorderToleranceMs, maxFilesPerTrigger)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the micro-batch is small by construction (maxFilesPerTrigger);
        // it feeds the single reorder buffer, as in the reference
        batch.select(col("payload"), unix_millis(col("timestamp")).as("ms"))
          .collect()
          .foreach(r => buffer.add(r.getLong(1), r.getString(0)))
        emit(buffer.release())
        ()
      }
      .start()
    query.awaitTermination()
    emit(buffer.drain()) // R14: end-of-input buffer drain, in order
    sentAcc.value
  }
}
