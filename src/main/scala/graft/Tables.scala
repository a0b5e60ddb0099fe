package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders + determinism helpers shared by every query.
  *
  * Determinism rule (SURVEY.md §2B design rule): results are hash-compared
  * against DuckDB, so float aggregation must be order-independent. Money
  * columns carry exactly 2 decimals, so we aggregate in integer cents
  * (`round(x*100) -> bigint`) — integer sums are associative and identical
  * across engines regardless of partial-aggregation order. Division back to
  * a double is a single IEEE op on identical operands, hence also identical.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as a long (nanosAsLong) and truncate to µs with
    * integer division (`div` — a double division would lose precision at
    * ~1.7e18 ns), matching DuckDB's TIMESTAMP_NS → TIMESTAMP truncation. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Exact integer cents of a 2-decimal money column. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact integer value of an n-decimal fixed-point column. */
  def fixed(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale).toLong, 0).cast("long")

  /** Milliseconds since epoch (truncating), portable vs DuckDB epoch_ms. */
  def tsMs(c: Column): Column = unix_millis(c)
}
