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

  test("native TokenBigrams equals the composed zip_with adjacency pipeline") {
    val docs = Tables.t(spark, d, "documents")
    val tk = DedupOps.tokens(col("text"))
    val adjacent = filter(
      zip_with(tk, slice(tk, lit(2), size(tk)),
        (x, y) => struct(x.as("a"), y.as("b"))),
      p => p.getField("b").isNotNull)
    val composed = docs.select(col("doc_id"),
      explode(transform(adjacent,
        p => concat_ws(" ", p.getField("a"), p.getField("b")))).as("bigram"))
    val native = docs.select(col("doc_id"),
      explode(TextFunctions.token_bigrams(col("text"))).as("bigram"))
    // multiplicity matters for counts: compare as (doc, bigram, count)
    val c = composed.groupBy("doc_id", "bigram").count()
    val n = native.groupBy("doc_id", "bigram").count()
    assert(native.count() == composed.count() && native.count() > 0)
    assert(n.except(c).count() == 0 && c.except(n).count() == 0)
  }

  test("TokenBigrams edge cases: empty, single-token, repeated-pair texts") {
    import spark.implicits._
    val out = Seq("", "alone", "a b a b", "  x   y  ")
      .toDF("text")
      .select(TextFunctions.token_bigrams(col("text")).as("bg"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq(), Seq(), Seq("a b", "b a", "a b"), Seq("x y")))
  }

  test("short and empty texts yield no shingles; null text yields null-safe empty") {
    import spark.implicits._
    val df = Seq("one two", "", "a b c", "  spaced   out   here  ")
      .toDF("text")
      .select(size(TextFunctions.shingle_hashes(col("text"), 3)).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 1, 1))
  }
}
