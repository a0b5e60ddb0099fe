package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic 10× scaling sweep: the plan-shape claims ("this survives a
  * 100× scale-up") checked against MEASURED growth, not just `.explain`.
  * The sf0.1 fixture is replicated 10× by deterministic id-salting and
  * the heaviest queries are timed at 1× vs 10×; a near-linear ratio
  * (≈10, modulo fixed per-query overhead) says the operator's cost is
  * proportional to data; a super-linear ratio exposes a hidden
  * quadratic or a broadcast that stopped fitting.
  *
  * Replication preserves the statistical shape instead of stacking
  * identical copies (which would make every dedup relation quadratic in
  * the replica count BY DATA, not by plan):
  *  - ids shift by replica·10⁸, so join integrity holds within a
  *    replica and keys never collide across replicas;
  *  - document TEXT is token-salted per replica (`tok~r`), so replicas
  *    are not near-duplicates of each other — shingle/minhash/tf-idf
  *    candidate relations stay within-replica and scale linearly, the
  *    way 10× of real crawl data behaves;
  *  - embeddings are component-ROTATED per replica — norms and the
  *    pairwise-similarity distribution survive, vectors differ;
  *  - fixed-probe queries (vec_id < 20, doc_id < 50) keep their probe
  *    set constant while the corpus grows — the realistic shape for
  *    eval-decontamination and ANN serving;
  *  - region/nation stay fixed (dimensions don't grow with SF in TPC-H
  *    either).
  * BOTH sides (1× and 10×) are materialized through this same writer,
  * so layout/encoding differences never pollute the ratio.
  *
  * Usage: sbt "runMain graft.tools.ScaleSweep" → scaling_out.json
  * (repo cwd), one JSON line with per-query {t1, t10, ratio}.
  */
object ScaleSweep {

  private val IdStride = 100000000L

  /** The heaviest BENCH_LOCAL queries (top of the r9 sweep) plus the new
    * index builds — every LLM-pipeline family with a nontrivial shuffle
    * shape is represented. */
  val Heavy: Seq[String] = Seq(
    "x26f_embedding_neardup_lsh", "x33c_split_decontam", "x45_ivf_append",
    "x27e_ann_pq", "x26h_tfidf_neardup", "x27f_ann_ivfpq",
    "x27h_ann_ivfpq_residual", "x39c_mix_temperature", "q15_setops",
    "q03b_large_join", "x28j_unigram_lm", "x27_cosine_topk",
    "x32c_pack_bins", "x33b_contamination_bloom", "x28d_tfidf_top_term",
    "q22_sessionize", "x59_corpus_diff", "x60_ngram_novelty",
    "x62_curation_report")

  /** Write the replicated fixture for `reps` replicas (1 = a re-encoded
    * copy of the base, the fair 1× baseline). */
  def generate(spark: SparkSession, base: String, out: String,
      reps: Int): Unit = {
    val r = spark.range(reps).select(col("id").as("__r"))
    def rep(name: String)(f: DataFrame => DataFrame): Unit = {
      val df = graft.Tables.t(spark, base, name)
      f(df.crossJoin(broadcast(r))).drop("__r")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    def shifted(c: String) = (col(c) + col("__r") * IdStride).as(c)

    rep("documents")(df => df.select(
      shifted("doc_id"),
      when(col("__r") === 0, col("text")).otherwise(
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("~"), col("__r"))))).as("text"),
      col("lang"), col("source"), col("n_chars"), col("__r")))
    rep("embeddings")(df => df.select(
      shifted("vec_id"),
      concat(slice(col("embedding"), col("__r") + 1, lit(64) - col("__r")),
        slice(col("embedding"), lit(1), col("__r"))).as("embedding"),
      col("label"), col("__r")))
    rep("events")(df => df.select(
      shifted("event_id"), col("ts"), shifted("user_id"),
      col("event_type"), col("value"), col("props"), col("__r")))
    rep("lineitem")(df => df.select(
      shifted("l_orderkey"), shifted("l_partkey"), shifted("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate"), col("__r")))
    rep("orders")(df => df.select(
      shifted("o_orderkey"), shifted("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"),
      col("__r")))
    rep("customer")(df => df.select(
      shifted("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"), col("__r")))
    rep("supplier")(df => df.select(
      shifted("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal"), col("__r")))
    rep("part")(df => df.select(
      shifted("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice"), col("__r")))
    Seq("region", "nation").foreach { name =>
      graft.Tables.t(spark, base, name)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
  }

  private def timeQuery(spark: SparkSession, name: String,
      dir: String): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = BenchSession.open()
    val d1 = s"$out/x1"; val d10 = s"$out/x10"
    val t0g = System.nanoTime()
    generate(spark, base, d1, 1)
    generate(spark, base, d10, 10)
    val genSec = (System.nanoTime() - t0g) / 1e9

    BenchSession.warmTables(spark, d1)
    BenchSession.warmEngine(spark, d1)
    // JIT/codegen warm-up on the 1× side so neither sweep pays it
    timeQuery(spark, Heavy.head, d1)

    val rows = Heavy.map { name =>
      val t1 = timeQuery(spark, name, d1)
      (name, t1)
    }
    graft.ops.PerAppCache.evictAll() // drop the 1× cached relations
    BenchSession.warmTables(spark, d10)
    val full = rows.map { case (name, t1) =>
      val t10 = timeQuery(spark, name, d10)
      (name, t1, t10, t10 / t1)
    }
    graft.ops.PerAppCache.evictAll()

    // at-scale CONFIGURATION variants: the fixture queries run a fixed
    // config the oracle can replay (4-bit SRP buckets), which is NOT the
    // config a 10× corpus should run — measure the documented remedy
    // (srpBitsFor: bits sized to corpus → constant expected bucket
    // occupancy) so the artifact shows it restores linearity where the
    // fixed config goes quadratic.
    def timeThunk(f: => Long): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def x26fAdaptive(dir: String): Long = {
      val e = graft.Tables.t(spark, dir, "embeddings")
      val bits = graft.api.TrainingData.srpBitsFor(e.count())
      graft.api.TrainingData.embeddingNearDupPairs(
        e, "vec_id", "embedding", 0.4, tables = 8, bits = bits).count()
    }
    val e1 = timeThunk(x26fAdaptive(d1))
    val e10 = timeThunk(x26fAdaptive(d10))
    val extrasJson =
      s""""x26f_adaptive_bits":{"t1":${math.round(e1 * 1000) / 1000.0},"t10":${math.round(e10 * 1000) / 1000.0},"ratio":${math.round(e10 / e1 * 1000) / 1000.0}}"""
    graft.ops.PerAppCache.evictAll()

    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val qjson = full.map { case (n, t1, t10, ratio) =>
      s""""$n":{"t1":${r3(t1)},"t10":${r3(t10)},"ratio":${r3(ratio)}}"""
    }.mkString("{", ",", "}")
    val flagged = full.collect { case (n, _, _, ratio) if ratio > 12.0 => n }
    val flaggedJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"scaling_10x","base":"$base","replicas":10,"gen_seconds":${r3(genSec)},"n_queries":${full.size},"flagged_superlinear":$flaggedJson,"queries":$qjson,"adaptive_variants":{$extrasJson}}"""
    println(line)
    BenchSession.writeArtifact("scaling_out.json", line)
    spark.stop()
  }
}
