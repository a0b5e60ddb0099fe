package graft.replay

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R6/R9 — the simulated-ingestion-time schedule.
  *
  * Reference semantics (JsonEvent.java:95-97): each event's ingestion time
  * is `ingestionStart + (eventTime − firstEventTime) / speedupFactor`, an
  * affine map from the event-time domain onto the wall clock, computed at
  * millisecond precision (JsonEvent.java:96 `toMillis`).
  *
  * The reference anchors `firstEventTime` statefully on the first parsed
  * event (JsonEvent.java:91-93); declaratively that anchor is `min(ts)`,
  * computed once and broadcast — one tiny scalar exchanged, no shuffle of
  * the event stream itself.
  */
object Schedule {

  /** Adds `ingestion_time` (timestamp) + `ingestion_ms` (epoch millis). */
  def withIngestionTime(events: DataFrame, speedupFactor: Long,
      ingestionStartMs: Long): DataFrame = {
    val anchor = events.agg(min(unix_millis(col("timestamp"))).as("first_ms"))
    events
      .crossJoin(broadcast(anchor))
      .withColumn("ingestion_ms",
        lit(ingestionStartMs) +
          floor((unix_millis(col("timestamp")) - col("first_ms")) /
            lit(speedupFactor.toDouble)))
      .withColumn("ingestion_time", timestamp_millis(col("ingestion_ms")))
      .drop("first_ms")
  }

  /** Pure form used by tests and per-record paths. */
  def ingestionMs(eventMs: Long, firstEventMs: Long, ingestionStartMs: Long,
      speedupFactor: Long): Long =
    ingestionStartMs + math.floorDiv(eventMs - firstEventMs, speedupFactor)
}
