package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vintage-proofing for the driver-generated fixtures (round-7 lesson: the
  * driver regenerated `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
  * and the loaders broke). This spec pins two things:
  *  1. every fixture table loads through `Tables.t` and `events.ts`
  *     normalizes to TimestampType, whatever encoding the current fixture
  *     generation uses;
  *  2. `Tables.normalizeTs` maps each encoding the fixtures have ever used
  *     (ns-as-long, TIMESTAMP_NTZ µs, TIMESTAMP µs) to the SAME instants.
  */
class FixtureSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("every fixture table loads and is non-empty at sf0.001") {
    tables.foreach { name =>
      val df = Tables.t(spark, dir, name)
      assert(df.limit(1).count() == 1, s"table $name is empty")
    }
  }

  test("events.ts normalizes to TimestampType for the current fixture vintage") {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts loaded as ${df.schema("ts").dataType}")
    // sanity: event times are epoch-plausible (year 2000..2100), i.e. not
    // silently scaled 1000x in either direction
    val Array(lo, hi) = df.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val y2000 = 946684800000000L; val y2100 = 4102444800000000L
    assert(lo > y2000 && hi < y2100, s"events.ts range [$lo,$hi] is not µs-scale")
  }

  test("normalizeTs maps all three historical ts encodings to identical instants") {
    import spark.implicits._
    val micros = Seq(1700000000000000L, 1700000123456789L, 1712345678901234L)
    val asNanosLong = micros.map(_ * 1000L).toDF("ts")
    val asTz = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    // µs-exact NTZ: cast the TIMESTAMP under the pinned UTC session timezone
    val asNtzExact = asTz.select(col("ts").cast(TimestampNTZType).as("ts"))

    def instants(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Tables.normalizeTs(df).select(unix_micros(col("ts")))
        .as[Long].collect().sorted.toSeq

    assert(instants(asNanosLong) == micros.sorted)
    assert(instants(asNtzExact) == micros.sorted)
    assert(instants(asTz) == micros.sorted)
  }

  test("batch and streaming events loaders yield identical (event_id, ts) sets") {
    val q = graft.streaming.StreamingOps.eventsStream(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream.outputMode("append").format("memory")
      .queryName("loader_parity_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("loader_parity_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val batch = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(batch.nonEmpty && streamed.sameElements(batch))
  }
}
