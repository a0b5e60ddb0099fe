package graft.replay

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming form of the replay pipeline (SURVEY.md §2A R8/R14
  * mapping): `readStream` text source → parse → watermark reorder →
  * paced `foreachBatch` sink.
  *
  * The reference's 100k-event priority-queue reorder buffer
  * (JsonEventBufferedReader.java:39-47) becomes an event-time watermark: the
  * state store plays the bounded buffer, the watermark delay is the disorder
  * horizon. Backpressure (the reference's semaphore) becomes
  * `maxFilesPerTrigger`. `Trigger.AvailableNow` gives "replay everything,
  * then stop" — the reference's drain-termination protocol
  * (RePlayer.java:132-164) without its fill() hang (SURVEY.md §8.1).
  */
object StreamingReplay {

  /** Streaming scheduled events; watermark bounds reorder state. The
    * suffix anti-filter (R4) is applied via input_file_name — readStream
    * has no file-list form, and pathGlobFilter is positive-only — and
    * unreadable objects are skipped (R5) like the batch path. */
  def stream(spark: SparkSession, cfg: ReplayConfig,
      disorderTolerance: String = "10 minutes"): DataFrame = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", "16")
      .option("ignoreCorruptFiles", "true")
      .text(cfg.inputPath)
      .filter(!input_file_name().endsWith(cfg.objectSuffixToSkip))
    Parse.seek(Parse.parsed(lines, cfg.timestampAttributeName), cfg.seek)
      .withWatermark("timestamp", disorderTolerance)
  }

  /** Paced replay to a [[RecordSender]]. Within each micro-batch, events are
    * sorted by event time and paced against the affine schedule anchored at
    * the stream's first observed event (reference: JsonEvent.java:91-93). */
  def run(spark: SparkSession, cfg: ReplayConfig, sender: RecordSender,
      nowMs: () => Long = () => System.currentTimeMillis(),
      sleeper: Long => Unit = Thread.sleep): StreamingQuery = {
    val startMs = cfg.ingestionStartMs.getOrElse(System.currentTimeMillis())
    // anchor is stateful across micro-batches, like the reference's parser
    val anchorMs = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    stream(spark, cfg).writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val withMs = batch.select(col("payload"), unix_millis(col("timestamp")).as("ms"))
        val sorted = withMs.repartitionByRange(cfg.senderParallelism, col("ms"))
          .sortWithinPartitions(col("ms"))
        if (anchorMs.get() == Long.MinValue) {
          val first = withMs.agg(min(col("ms"))).first()
          if (!first.isNullAt(0)) anchorMs.compareAndSet(Long.MinValue, first.getLong(0))
        }
        val a = anchorMs.get()
        if (a != Long.MinValue) {
          val speedup = cfg.speedupFactor
          sorted.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val paced = it.map { r =>
              Pace.paceTo(Schedule.ingestionMs(r.getLong(1), a, startMs, speedup),
                nowMs, sleeper)
              r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            }
            Sink.sendAll(paced, sender, sleeper)
            ()
          }
        }
        ()
      }
      .start()
  }
}
