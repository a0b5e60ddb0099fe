package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BucketIndex must equal the chained-when fold it replaced in the
  * two-pass global-sequence operators (emit-rank, sequence packing). */
class BucketExprSpec extends SparkSpec {
  import spark.implicits._

  private val bounds = Seq(10.0, 20.0, 20.0, 35.5, 90.0)

  private def foldForm(bs: Seq[Double]) =
    bs.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("v") > lit(b), 1).otherwise(0)
    }

  test("native BucketIndex equals the chained-when fold, including ties") {
    val vals = Seq(-5.0, 0.0, 10.0, 10.0001, 19.999, 20.0, 20.5, 35.5,
      36.0, 89.999, 90.0, 90.1, 1e18, Double.NaN)
    val df = vals.toDF("v")
      .select(col("v"),
        RangeFunctions.bucket_index(col("v"), bounds).as("native"),
        foldForm(bounds).as("fold"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"v=${r.getDouble(0)}: native=${r.getInt(1)} fold=${r.getInt(2)}")
    }
    // Spark SQL orders NaN ABOVE every double (unlike Java's >), so both
    // forms put NaN in the last bucket
    assert(rows.last.getInt(1) == bounds.length)
  }

  test("empty bounds put everything in bucket 0; null value stays null") {
    val df = Seq(Some(7.0), None).toDF("v")
      .select(RangeFunctions.bucket_index(col("v"), Seq.empty).as("b"))
    val out = df.collect()
    assert(out(0).getInt(0) == 0 && out(1).isNullAt(0))
  }

  test("a 4096-boundary array neither deepens the plan nor slows the row path") {
    // the whole point: bucket count beyond the old 1024 chained-when cap
    val big = (1 to 4096).map(_.toDouble)
    val df = spark.range(0, 10000)
      .select(RangeFunctions.bucket_index(col("id").cast("double"), big).as("b"))
    // id=0 → 0 bounds below; id=5000 → 4096 capped... every id>4096 → 4096
    val got = df.groupBy(col("b")).count().orderBy(col("b")).collect()
    assert(got.head.getInt(0) == 0)
    assert(got.last.getInt(0) == 4096 && got.last.getLong(1) == 10000 - 4097)
  }

  test("rejects unsorted bounds at analysis (binary search precondition)") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.0).toDF("v")
        .select(RangeFunctions.bucket_index(col("v"), Seq(30.0, 10.0, 20.0)))
        .collect()
    }
    assert(err.getMessage.contains("sorted"))
  }

  test("rejects a non-double input column at analysis") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("v")
        .select(RangeFunctions.bucket_index(col("v"), bounds)).collect()
    }
    assert(err.getMessage.contains("bucket_index"))
  }
}
