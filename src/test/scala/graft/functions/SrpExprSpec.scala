package graft.functions

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SrpExprSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  /** The composed-builtin form the native expression must reproduce. */
  private def composedBucket(emb: org.apache.spark.sql.Column, table: Int, bits: Int) =
    (0 until bits).map { p =>
      val proj = aggregate(
        transform(emb, (x, i) =>
          when(pmod(xxhash64(lit(table), lit(p), i), lit(2)) === 0,
            x.cast("double")).otherwise(-x.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("native SrpBuckets reproduces the composed per-table buckets exactly") {
    val e = Tables.t(spark, d, "embeddings").limit(100)
    val native = e.select(col("vec_id"),
      SrpFunctions.srp_buckets(col("embedding"), 3, 4).as("bks"))
    val composed = e.select(col("vec_id"),
      array((0 until 3).map(t => composedBucket(col("embedding"), t, 4)): _*).as("bks"))
    assert(native.count() == 100)
    assert(native.except(composed).count() == 0)
    assert(composed.except(native).count() == 0)
  }
}
