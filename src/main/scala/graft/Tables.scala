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

  /** Dtype-adaptive events loader. Fixture generations have stored
    * `events.ts` as either parquet TIMESTAMP(NANOS) — which Spark 4 rejects
    * unless read as a long via nanosAsLong — or plain TIMESTAMP(MICROS).
    * Inspect the decoded Spark type and normalize to TimestampType:
    *  - LongType ts = nanoseconds → truncate to µs with integer division
    *    (`div` — a double division would lose precision at ~1.7e18 ns, and
    *    DuckDB's TIMESTAMP_NS → TIMESTAMP does the same truncation);
    *  - TimestampNTZType (MICROS with isAdjustedToUTC=false) → cast, which
    *    is value-preserving because every entrypoint pins the session
    *    timezone to UTC — matching DuckDB's naive-timestamp reading;
    *  - TimestampType passes through untouched. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    normalizeTs(raw)
  }

  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Exact integer cents of a 2-decimal money column. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact integer value of an n-decimal fixed-point column. */
  def fixed(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale).toLong, 0).cast("long")

  /** Milliseconds since epoch (truncating), portable vs DuckDB epoch_ms. */
  def tsMs(c: Column): Column = unix_millis(c)

  /** Widen a relation to at least `defaultParallelism` partitions — for
    * operators whose per-partition work is SUPER-LINEAR in the partition's
    * rows (the O(n²) nested-loop baselines): there the repartition shuffle
    * is trivially repaid. For merely row-heavy scans (tokenize/hash) the
    * shuffle of raw text costs more than it buys — measured; use finer
    * scan splits (`spark.sql.files.maxPartitionBytes`) instead, which is
    * what a many-file 100 TB layout provides naturally. Conditional on the
    * current partition count: an already-wide corpus passes through
    * shuffle-free. Results unaffected (order-independent aggregation). */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
