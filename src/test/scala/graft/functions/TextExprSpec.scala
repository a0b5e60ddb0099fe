package graft.functions

import graft.SparkSpec
import graft.Tables
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

class TextExprSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("native ShingleHashes equals xxhash64 over the composed shingle pipeline") {
    val docs = Tables.t(spark, d, "documents")
    val composed = docs.select(col("doc_id"),
      explode(DedupOps.shingles(DedupOps.tokens(col("text")))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("shh"))
    val native = docs.select(col("doc_id"),
      explode(TextFunctions.shingle_hashes(col("text"), 3)).as("shh"))
    assert(native.count() == composed.count())
    assert(native.except(composed).count() == 0)
    assert(composed.except(native).count() == 0)
  }

  test("short and empty texts yield no shingles; null text yields null-safe empty") {
    import spark.implicits._
    val df = Seq("one two", "", "a b c", "  spaced   out   here  ")
      .toDF("text")
      .select(size(TextFunctions.shingle_hashes(col("text"), 3)).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 1, 1))
  }
}
