package graft.api

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.SparkSpec

/** End-to-end composition guard: the curation operators chain the way a
  * user of the library would chain them — quality cut → exact dedup →
  * split → sequence packing — as ONE lazy plan over the corpus, and the
  * composed physical plan keeps the shapes each operator guarantees in
  * isolation (no cartesian products, no inner nested-loop joins). At
  * 100 TB the composition IS the product: an operator that only behaves
  * when used alone would silently degrade the pipeline. */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  import graft.Tables.t

  test("quality cut → dedup → split → pack composes as one sane lazy plan") {
    val docs = t(spark, dir, "documents")
    val nDocs = docs.count()

    // 1. keep the top 70% of each language by length
    val q = TrainingData.topFractionByStrata(docs, "lang", "n_chars", 0.7)
    // 2. drop exact duplicates, keeping the canonical (min-id) copy
    val canon = TrainingData.exactDedup(q, "doc_id", "text")
      .select(col("canonical_id").as("doc_id"))
    val deduped = q.join(canon, Seq("doc_id"), "left_semi")
    // 3. token-weighted source mixture at ~60% of the curated corpus
    //    (the mixture passes every input column through, so the chain
    //    continues with `text` intact)
    import spark.implicits._
    val srcs = deduped.select("source").distinct().as[String].collect()
    val curTokens = deduped.select(
        size(split_part_tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).first().getLong(0)
    val mixed = TrainingData.mixByTokenBudget(deduped, "source", "doc_id",
      "text", srcs.map(_ -> 1.0 / srcs.length).toMap, curTokens * 6 / 10)
    // 4. deterministic 90/10 split
    val split = TrainingData.deterministicSplit(mixed, "doc_id",
      Seq(("train", 90), ("val", 10)))
    // 5. pack the train split at a 2048-token budget
    val train = split.filter(col("split") === "train")
    val packed = TrainingData.packSequences(train, "doc_id", "text", 2048L)

    // row conservation at every stage
    val nQ = q.count()
    val nDeduped = deduped.count()
    val nMixed = mixed.count()
    val nTrain = train.count()
    assert(nQ <= nDocs && nQ > 0)
    assert(nDeduped <= nQ && nDeduped > 0)
    assert(nMixed <= nDeduped && nMixed > 0)
    assert(split.count() == nMixed)
    assert(packed.count() == nTrain)

    // token conservation: the packing assigns every train token exactly once
    val packedTokens = packed.agg(sum(col("n_tokens"))).first().getLong(0)
    val trainTokens = train
      .select(size(split_part_tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).first().getLong(0)
    assert(packedTokens == trainTokens,
      s"packed $packedTokens tokens, train corpus has $trainTokens")

    // bins are dense from 0 and within budget for docs that fit
    val bins = TrainingData.packedBins(packed)
    val maxTok = bins.agg(max(col("n_tokens"))).first().getLong(0)
    assert(maxTok <= 2048L + trainMaxDocTokens(train),
      s"a bin overflows past one oversized doc: $maxTok")

    // composed plan hygiene: the chain keeps every operator's shape —
    // no cartesian product, no INNER nested-loop join anywhere (the only
    // BNLJ the pack stage owns is the bounded bucket-offset triangle
    // join, which is LeftOuter over a ≤shuffle-partitions-row relation)
    val p = packed.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")), p)
  }

  // whitespace-token count of the longest train doc (the packing places
  // each doc whole, so one bin may exceed the budget by at most one doc)
  private def trainMaxDocTokens(train: org.apache.spark.sql.DataFrame): Long =
    train.select(size(split_part_tokens(col("text"))).cast("long").as("n"))
      .agg(max(col("n"))).first().getLong(0)

  // the pipeline's token definition: split on single spaces, drop empties
  // (identical to packSequences' internal tokenization)
  private def split_part_tokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), " "), t => t =!= "")
}
