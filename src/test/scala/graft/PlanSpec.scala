package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-SHAPE regression guards: the scale claims in SURVEY.md §4 and
  * README ("dimension joins broadcast", "top-k is TakeOrderedAndProject,
  * no global sort", "filters reach the parquet scan", "LSH paths are
  * equi-joins, not cartesian") asserted against the optimized physical
  * plans, so a rewrite that silently degrades a plan to a worse shape
  * fails CI rather than only showing up as a bench regression. Plans are
  * inspected at sf0.001 — plan shape, unlike timing, is stable there. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q03 dimension join broadcasts (no shuffle of the fact side for it)") {
    val p = plan("q03_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
  }

  test("q10 top-k plans as TakeOrderedAndProject, not a global sort+limit") {
    val p = plan("q10_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q02 filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["))
    // at least one real pushed predicate, not just the bare IsNotNull list
    assert(p.contains("GreaterThan") || p.contains("LessThan") ||
      p.contains("EqualTo") || p.contains("GreaterThanOrEqual"))
  }

  test("x26b MinHash-LSH candidates come from an equi-join — no cartesian/BNLJ") {
    val p = plan("x26b_minhash_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x40 semdedup pair scan is an equi-join on the cluster id — no cartesian") {
    val p = plan("x40_semdedup")
    // the cached index build contains the accepted Cross BNLJ anchor
    // (corpus × broadcast 16-row centroid literal); the PAIR scan itself
    // must be a real equi-join — an Inner BNLJ would mean it degraded to
    // all-pairs
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("x27e PQ ADC scan joins codes to the broadcast LUT — no inner BNLJ") {
    val p = plan("x27e_ann_pq")
    // the codebook build contains the accepted Cross BNLJ anchors
    // (subvectors × broadcast codebook literal); the ADC scan itself is
    // codes ⋈ broadcast(LUT) on (m, cid) + an integer aggregation
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x40b cluster profile joins the centroid literal by broadcast") {
    val p = plan("x40b_cluster_profile")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x33b bloom scan prunes the corpus side before the aggregation exchange") {
    val p = plan("x33b_contamination_bloom")
    assert(p.contains("might_contain"), p.linesIterator.take(40).mkString("\n"))
  }

  // distinct plan nodes only — formatted mode repeats each node name in
  // the detail section as "(id) Name", and a cached/reused subtree's tree
  // lines render once per reference, so: match tree lines where the node
  // name (word-bounded — "Window" must not match "WindowGroupLimit") leads
  // the line after the tree-drawing prefix, optionally followed by
  // modifiers ("BroadcastHashJoin Inner BuildRight (52)"), and count
  // DISTINCT trailing "(id)"s
  private val nodeId = """\((\d+)\)\s*$""".r
  private def treeCount(p: String, node: String): Int =
    p.linesIterator.flatMap { l =>
      val t = l.dropWhile(c => c == ' ' || c == ':' || c == '+' || c == '-' || c == '*')
      if (!t.startsWith(node)) None
      else {
        val rest = t.drop(node.length)
        if (rest.startsWith(" ") || rest.startsWith("("))
          nodeId.findFirstMatchIn(rest).map(_.group(1))
        else None
      }
    }.toSet.size

  test("real-decode queries stay row-local: one result-order exchange only") {
    // the decode work (inflate/unfilter/PCM) runs inside mapPartitions;
    // any additional Exchange would mean payload bytes started shuffling
    Seq("x29f_pixel_stats", "x29g_pcm_stats").foreach { q =>
      val p = plan(q)
      assert(treeCount(p, "Exchange") <= 1, s"$q:\n$p")
    }
  }

  test("x56/x57 are one-window plans (no self-join, no global row number)") {
    val p56 = plan("x56_preference_pairs")
    assert(treeCount(p56, "Window") == 1, p56)
    assert(treeCount(p56, "Exchange") <= 2, p56) // window + result order
    assert(!p56.contains("SortMergeJoin") && !p56.contains("CartesianProduct"), p56)
    val p57 = plan("x57_source_interleave")
    assert(treeCount(p57, "Window") == 1, p57)
    assert(p57.contains("BroadcastHashJoin"), p57) // weights attach by broadcast
    // two SHUFFLE exchanges (window partition + result order); the weight
    // BroadcastExchange is not a shuffle and is excluded from the count
    val shuffles = p57.linesIterator.count(l =>
      l.contains("Exchange (") && !l.contains("BroadcastExchange ("))
    assert(shuffles <= 2, p57)
  }

  test("x61 vocab top-k plans as TakeOrderedAndProject, never a global vocab sort") {
    val p = plan("x61_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x59 corpus diff joins hashes, not text: one full-outer equi-join") {
    val p = plan("x59_corpus_diff")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x33c split decontamination reads documents.parquet once (split persisted)") {
    val p = plan("x33c_split_decontam")
    // the split predicate is hash-derived (not pushdownable), so the
    // train/test branches MUST share one materialized split relation —
    // two parquet scans here would mean 2× corpus I/O at scale
    assert(treeCount(p, "Scan parquet") <= 1, p)
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"), p)
  }

  test("x31b hash sample is a pure scan+filter — no shuffle at all") {
    val p = plan("x31b_sample")
    // the sample itself adds no Exchange; the fixture's orderBy adds the
    // single result-ordering exchange and nothing else
    assert(treeCount(p, "Exchange") <= 1, p)
  }

  test("x25 exact dedup is one partial->final hash aggregation (single exchange)") {
    val p = plan("x25_exact_dedup")
    assert(p.contains("HashAggregate"))
    assert(treeCount(p, "Exchange") <= 2, p) // agg + result order
  }

  test("q03b flips broadcast->sort-merge once both sides outgrow the threshold") {
    // SCALING_r10 measured q03b at 6.99x per 10x data — the documented
    // broadcast->SMJ strategy transition. Pin the at-scale plan here so a
    // stats regression can't silently degrade it to a BNLJ/cartesian and
    // hide inside the sweep ratio: replicate orders far past the 10 MB
    // broadcast threshold (the query prunes orders to 2 of 7 columns and
    // the estimator scales the file size by that fraction, so the file
    // must be ~4x the threshold: sf0.001 orders ~36 KB x 2000 ~ 70 MB ->
    // ~20 MB pruned estimate; keys stride-shifted so join integrity
    // holds within a replica) and assert the planner picks the shuffled
    // sort-merge join. Plan-only — nothing executes.
    import org.apache.spark.sql.functions.{broadcast, col}
    val out = java.nio.file.Files.createTempDirectory("q03b_rep").toString
    val stride = 100000000L
    def rep(table: String, key: String, n: Int): Unit = {
      val r = spark.range(n).select(col("id").as("__r"))
      spark.read.parquet(s"$dir/$table.parquet").crossJoin(broadcast(r))
        .withColumn(key, col(key) + col("__r") * stride)
        .drop("__r").write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    rep("lineitem", "l_orderkey", 300)
    rep("orders", "o_orderkey", 2000)
    // scaled-down threshold, NOT -1: the decision stays stats-driven
    // (both pruned estimates sit ~4x above it, the same proportion as
    // multi-GB sides vs the default 10 MB), so a future broadcast hint
    // or a stats estimate collapsing to zero still fails here where
    // disabling broadcast outright would mask it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (1 << 20).toString)
    try {
      val p = SparkEntry.queries("q03b_large_join")(spark, out)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p.linesIterator.take(40).mkString("\n"))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("x72 pagerank plan stays bounded: rounds chain lazily over checkpointed leaves") {
    // the rank update is a LINEAR chain, so rounds compose lazily into
    // one job (r17) — ONE aggregation exchange per in-chunk round, each
    // reading the checkpointed adjacency leaf, with lineage truncated
    // every truncateEvery rounds. Bounded-linear is the property: the
    // pre-checkpoint naive form re-expanded prior iterations into
    // ~4600 exchanges for 5 rounds; the fixture's 5 rounds must plan
    // as <= 5 round exchanges + the deg-attach/result-order tail
    val p = plan("x72_dup_pagerank")
    assert(treeCount(p, "Exchange") <= 8, p.linesIterator.take(30).mkString("\n"))
    // every round joins ranks to the MATERIALIZED adjacency (no parquet
    // re-scan inside the loop)
    assert(treeCount(p, "Scan parquet") == 0, p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x68/x76 probe-side relations broadcast; no cartesian anywhere") {
    val spans = plan("x68_contam_spans")
    assert(spans.contains("BroadcastHashJoin"), spans.linesIterator.take(30).mkString("\n"))
    assert(!spans.contains("CartesianProduct"), spans)
    val bm25 = plan("x76_bm25_topk")
    // the postings × query-terms join and the df attach are broadcast
    // hash joins; the only nested-loop is the 1-row (N, avgdl) scalar
    assert(treeCount(bm25, "BroadcastHashJoin") >= 2, bm25.linesIterator.take(40).mkString("\n"))
    assert(!bm25.contains("CartesianProduct"), bm25)
    assert(!bm25.contains("SortMergeJoin"), bm25)
  }

  test("x79/x80 top-k stats queries plan as TakeOrderedAndProject, no cartesian") {
    Seq("x79_pmi_collocations", "x80_term_burstiness").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("x81/x83 layout queries: bounded exchanges, the windows partition by key") {
    // x81's strata-count checkpoint turns the seat arithmetic into
    // materialized ExistingRDD leaves (their Exchanges move ≤ strata
    // rows); the CORPUS is scanned exactly once, for the rank window
    val p81 = plan("x81_stratified_quota")
    assert(treeCount(p81, "Scan parquet") == 1, p81)
    assert(treeCount(p81, "Window") == 2, p81) // strata remainder + corpus rank
    assert(!p81.contains("CartesianProduct"), p81)
    val p83 = plan("x83_epoch_shuffle")
    assert(treeCount(p83, "Exchange") <= 2, p83)
    assert(treeCount(p83, "Window") == 1, p83)
  }

  test("x84 integrity audit joins (key,count)-reduced sides full-outer") {
    val p = plan("x84_integrity_audit")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x85 zipf: per-stratum vocabulary window, bounded exchanges") {
    val p = plan("x85_zipf_slope")
    assert(treeCount(p, "Window") == 1, p)
    assert(treeCount(p, "Exchange") <= 3, p)
  }

  test("x88/x89 event windows partition by series/user; no cartesian") {
    // the three frame aggregates may split across two Window nodes over
    // the SAME series partitioning — what matters is no extra exchange
    val p88 = plan("x88_event_anomaly")
    assert(treeCount(p88, "Window") <= 2, p88)
    assert(treeCount(p88, "Exchange") <= 3, p88)
    assert(!p88.contains("CartesianProduct"), p88)
    // x89's pair matrix checkpoints (the lag window runs ONCE at
    // materialization): the final plan is a slim join of leaves
    val p89 = plan("x89_event_transitions")
    assert(treeCount(p89, "Scan parquet") == 0, p89)
    assert(!p89.contains("CartesianProduct") &&
      !p89.contains("BroadcastNestedLoopJoin"), p89)
  }

  test("x90/x91 drift/skip-gram: one corpus scan path, top-k stays TakeOrdered") {
    // x90's (stratum, value) counts checkpoint once — the grid, margins,
    // and sizes derive from the materialized leaf, so the final plan
    // carries ZERO parquet scans and the cumulative window over the grid
    val p90 = plan("x90_ks_drift")
    assert(treeCount(p90, "Scan parquet") == 0, p90)
    assert(treeCount(p90, "Window") >= 1, p90)
    assert(!p90.contains("CartesianProduct"), p90)
    val p91 = plan("x91_skipgram_pmi")
    assert(p91.contains("TakeOrderedAndProject"), p91)
    assert(!p91.contains("CartesianProduct"), p91)
  }

  test("bucketed tables join co-located: zero exchanges in the join plan") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.api.TrainingData.saveBucketed(
      docs.select($"doc_id", $"lang"), "bkt_docs", "doc_id", 4)
    graft.api.TrainingData.saveBucketed(
      docs.select($"doc_id", $"n_chars"), "bkt_stats", "doc_id", 4)
    // the fixture is tiny, so the planner would broadcast (its own
    // exchange) — disable auto-broadcast to expose the large-large shape
    // bucketing exists for: a sort-merge join with NO exchange at all
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_docs").join(spark.table("bkt_stats"), "doc_id")
      val p = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin") &&
        !p.linesIterator.exists(l => l.contains("Exchange (")),
        p.linesIterator.take(20).mkString("\n"))
      assert(joined.count() == docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_docs")
      spark.sql("DROP TABLE IF EXISTS bkt_stats")
    }
  }

  test("partitioned layout prunes non-matching partitions at planning time") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("part_docs").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.api.TrainingData.savePartitioned(
      docs.select($"doc_id", $"n_chars", $"lang"), out, Seq("lang"))
    val langs = docs.select($"lang").distinct().count()
    assert(langs > 1) // pruning must have something to prune
    val one = spark.read.parquet(out).filter($"lang" === "en")
    val p = one.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the filter lands in PartitionFilters (directory-level skip), and the
    // scan opens only the one partition's directory
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("lang")), p)
    val scanned = one.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ == 1), s"partitions: $scanned")
    assert(one.count() == docs.filter($"lang" === "en").count())
  }

  test("x26h tf-idf near-dup pairs come from the token equi-join — no cartesian") {
    val p = plan("x26h_tfidf_neardup")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop joins are the 1-row scalar n_docs attaches
    // (Cross BuildRight); the PAIR join itself must be a hash/merge
    // equi-join — an Inner BNLJ would mean the posting-list join degraded
    // to all-pairs
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("x31e per-key cap pushes the rank limit below the window (WindowGroupLimit)") {
    val p = plan("x31e_cap_per_key")
    // Spark's rank-limit pushdown: each map task pre-prunes its partition
    // to the top-n per key BEFORE the shuffle, so a hot key ships at most
    // n·tasks rows instead of its whole row set
    assert(p.contains("WindowGroupLimit"), p.linesIterator.take(30).mkString("\n"))
  }

  test("x35 span dedup is equi-joins and aggregations only — no cartesian/BNLJ") {
    val p = plan("x35_span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q26 upsert is a single full-outer join on the key") {
    val p = plan("q26_merge_upsert")
    // tree lines end in "(id)"; the join node carries its type between
    // name and id ("SortMergeJoin FullOuter (13)"), so match that form
    val joins = p.linesIterator.filter(_.matches(""".*SortMergeJoin \w+ \(\d+\)$""")).toSeq
    assert(joins.size == 1 && joins.head.contains("FullOuter"), p)
  }

  test("x39 mixture is one aggregation broadcast back — no per-source shuffle of the corpus") {
    val p = plan("x39_mix")
    // the totals attach via broadcast, and the only exchanges are the
    // totals aggregation's own plus the fixture's result ordering — the
    // corpus row stream itself is never reshuffled by source
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(treeCount(p, "Exchange") <= 3, p)
  }

  test("x39b replication is a row-local explode — no extra shuffle beyond x39's") {
    val p = plan("x39b_mix_replicated")
    // epoch fan-out must plan as Generate over the filtered rows, not a
    // join or a shuffle
    assert(p.linesIterator.exists(_.contains("Generate")), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(treeCount(p, "Exchange") <= 3, p)
  }

  test("x39c temperature mixture derives weights without reshuffling the corpus") {
    val p = plan("x39c_mix_temperature")
    // ONE corpus scan feeds one totals aggregation; the weight-sum fold
    // is a window over those ~20 aggregated rows (a second aggregation
    // branch would rescan the corpus), and the result attaches back by a
    // single broadcast. The corpus stream itself sees only a Generate
    // (epoch explode) — never a sort-merge join or per-source
    // repartition. Exchanges: totals agg + window + broadcast + ordering.
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(p.linesIterator.exists(_.contains("Generate")), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(treeCount(p, "Exchange") <= 4, p)
    assert(treeCount(p, "Scan parquet") <= 2, p) // corpus + totals branch share one scan each
  }

  test("oracle-checked queries emit scalar columns only (driver comparator contract)") {
    // the driver's DuckDB comparator lexsorts every column in pandas;
    // array/map/struct cells are unhashable there and crash the gate
    // (CORRECTNESS_r05 x32c err) — so the contract is: any query with an
    // oracle serializes nested values (array_join/to_json) before return.
    // Known cost, accepted: a few constructions are eager (x27c runs the
    // Lloyd build's bounded centroid collects, x33b sizes its Bloom
    // filter), so this sweep executes real work to read schemas — there
    // is no schema without construction, and the side effect is useful
    // (it warms the PerAppCache for the suites that follow)
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty, s"nested columns in oracle queries:\n${offenders.mkString("\n")}")
  }

  test("x28i repetition stats are row-local — no Exchange beyond the fixture ordering") {
    // the round-8 regression: per-document gram stats computed via a
    // corpus-wide explode+groupBy(doc, n, gram) — a shuffle of ~5× the
    // text bytes for a row-local statistic. The sorted-run list-algebra
    // form must plan as projections over the scan; the only Exchange is
    // the fixture binding's result orderBy.
    val p = plan("x28i_repetition")
    assert(treeCount(p, "Exchange") <= 1, p)
    assert(!p.contains("HashAggregate") && !p.contains("Generate"), p)
    // the entropy twin rides the same sorted-run machinery: same guard
    val pe = plan("x28t_token_entropy")
    assert(treeCount(pe, "Exchange") <= 1, pe)
    assert(!pe.contains("HashAggregate") && !pe.contains("Generate"), pe)
  }

  test("row-local objective/cleaning transforms stay row-local (x41/x46/x47/x48)") {
    // the scan-speed family: line filtering, span corruption, FIM, and
    // within-doc line dedup are all per-row column algebra — a refactor
    // that introduces a join or aggregation into any of them silently
    // turns a map stage into a shuffle at 100 TB. Only the fixture
    // orderBy's single Exchange is allowed.
    for (q <- Seq("x41_line_filter", "x46_span_corrupt", "x47_fim",
        "x48_line_dedup", "x51_ul2_mixture")) {
      val p = plan(q)
      assert(treeCount(p, "Exchange") <= 1, s"$q:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("x44 curriculum thresholds come from ONE aggregation broadcast back — corpus not reshuffled") {
    // quantile thresholds: one percentile aggregation over the score
    // relation, broadcast back; bucket assignment is a row-local
    // comparison fold. Exchanges: the nll-score aggregation chain + the
    // threshold agg + broadcast + fixture ordering — never a data-sized
    // ntile window or a sort-merge join of the corpus against itself.
    val p = plan("x44_curriculum")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.linesIterator.exists(l => l.contains("BroadcastNestedLoopJoin") ||
      l.contains("BroadcastHashJoin")), p)
    assert(!p.contains("Window ("), p) // no global ntile
  }

  test("x49 DSIR λ table attaches by broadcast; type-level scoring join only") {
    // the λ table is <= nBuckets rows and the totals are 1 row: both
    // attach by broadcast. The per-TYPE λ then joins the (doc, feature,
    // multiplicity) relation on the feature key — the x28j LM-scorer
    // shape (an equi-join on feature types, never an all-pairs scan)
    val p = plan("x49_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")), p)
  }

  test("x53 prototype prune joins the centroid literal by broadcast, one window") {
    val p = plan("x53_prototype_prune")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
    // exactly one Window node: the per-cluster rank (cluster-size bounded)
    assert(treeCount(p, "Window") == 1, p)
  }

  test("x96 passage chunking is row-local — no aggregation, one result exchange") {
    val p = plan("x96_passage_chunks")
    assert(treeCount(p, "Exchange") <= 1, p)
    assert(!p.contains("HashAggregate") && !p.contains("SortMergeJoin"), p)
  }

  test("x102 priority sample plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("x102_priority_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    // a Sort node outside the take would mean the corpus got globally sorted
    assert(treeCount(p, "Sort") == 0, p)
  }

  test("x104 resemblance pairs come from a lambda explode, not a shingle self-join") {
    // the per-shingle source-set aggregation + row-local pair lambda must
    // plan as Generate-over-aggregate; a shingle-keyed self-join would
    // surface as an extra large-side SortMergeJoin on shh
    val p = plan("x104_source_jaccard")
    assert(p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x108/x109 decode stays row-local; the pair join is banded, never all-pairs") {
    // audio features: decode inside mapPartitions, one result-order
    // exchange only — payload bytes must never shuffle
    val p109 = plan("x109_audio_segments")
    assert(treeCount(p109, "Exchange") <= 1, p109)
    // image hash pairs: candidates come from the band-equality equi-join;
    // a brute-force pair scan would surface as CartesianProduct or a
    // nested-loop join over the hash relation
    val p108 = plan("x108_image_phash")
    assert(!p108.contains("CartesianProduct"), p108)
    assert(!p108.contains("BroadcastNestedLoopJoin"), p108)
  }

  test("x113 centroid joins run on centroid-sized relations (broadcast), corpus scanned without a pair join") {
    val p = plan("x113_centroid_drift")
    // the half-A x half-B join is on (label, dim) centroid rows — tiny,
    // broadcastable; the corpus itself must never self-join
    assert(!p.contains("CartesianProduct"), p)
    assert(treeCount(p, "SortMergeJoin") == 0, p)
  }

  test("x114 boilerplate is one aggregation over hashes — no join, no window") {
    val p = plan("x114_prefix_boilerplate")
    assert(treeCount(p, "SortMergeJoin") == 0 &&
      treeCount(p, "BroadcastHashJoin") == 0, p)
    assert(treeCount(p, "Window") == 0, p)
    assert(treeCount(p, "Scan parquet") == 1, p)
  }

  test("x121/x122/x126 rank passes run over DISTINCT-value relations, not rows") {
    // the midrank/AP machinery must aggregate to per-value counts BEFORE
    // any window — a Window directly over the row-grain relation would
    // single-partition the full corpus instead of its value cardinality
    for (q <- Seq("x121_auc_exact", "x126_avg_precision")) {
      val p = plan(q)
      assert(treeCount(p, "Window") == 1, s"$q\n$p")
      assert(p.indexOf("HashAggregate") < p.indexOf("Window") ||
        p.indexOf("Window") < 0, q)
    }
    val p122 = plan("x122_spearman")
    // two midrank windows (x and y), both value-grain; the rank joins
    // broadcast the value→midrank relations back onto rows
    assert(treeCount(p122, "Window") == 2, p122)
    assert(treeCount(p122, "BroadcastHashJoin") == 2, p122)
    assert(!p122.contains("CartesianProduct"), p122)
  }

  test("x124 bootstrap explode is row-local; one B-key aggregation") {
    val p = plan("x124_bootstrap_ci")
    assert(p.contains("Generate"), p) // the explode
    assert(!p.contains("CartesianProduct"), p)
    // no sort-merge join anywhere: the bounds attach by broadcast
    assert(treeCount(p, "SortMergeJoin") == 0, p)
  }

  test("x129 profile: per-column HashAggregate dedup, no Expand/SortAggregate") {
    // the profiler's round-12 shape: one pruned single-column scan per
    // column into a codegen'd groupBy(value) HashAggregate, then a
    // 1-row reduction over the DISTINCT relation. The previous
    // multi-countDistinct form planned Expand ((1+n_cols)x row blowup)
    // into SortAggregates (string min/max buffers bar HashAggregate) —
    // measured ~14x slower at 600k rows, and THAT regression is what
    // this test pins against
    val p = plan("x129_table_profile")
    assert(!p.contains("Expand"), p)
    assert(treeCount(p, "Scan parquet") == 5, p) // one pruned scan/column
    assert(p.contains("HashAggregate"), p)
    assert(treeCount(p, "SortMergeJoin") == 0 &&
      !p.contains("CartesianProduct"), p)
    // raw rows are never sorted: any SortAggregate may only sit above
    // the dedup exchange (over the distinct relation), never on the scan
    val pf = plan("x129b_profile_floats")
    assert(!pf.contains("Expand"), pf)
  }

  test("x67 winnow fingerprinting is the native expression — no interpreted HOF fold") {
    val p = plan("x67_winnow_pairs")
    assert(p.contains("winnowselect") || p.contains("WinnowSelect") ||
      p.contains("winnow_select"), p.linesIterator.take(40).mkString("\n"))
    // selection stays row-local: the only joins are the fingerprint
    // equi-join of the pair stage
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x138 as-of join: one keyed window, pushed type filters, no join node") {
    val p = plan("x138_asof_attribution")
    // the whole point of the union-tag design: NO join operator at all —
    // a RangeJoin/BNLJ here would mean the as-of degraded to a range join
    assert(!p.contains("Join"), p)
    assert(treeCount(p, "Window") == 1, p)
    // the event_type predicate reaches both parquet scans
    assert(p.linesIterator.count(l =>
      l.contains("PushedFilters") && l.contains("EqualTo(event_type")) == 2, p)
  }

  test("x139/x142 sketches: bounded top-k/bucket relations, no raw-row sort") {
    val ph = plan("x139_loghist_quantiles")
    // the histogram is a hash aggregation; the only Sort may sit above
    // the tiny bucket relation (the final orderBy), never under the agg
    assert(ph.contains("HashAggregate"), ph)
    assert(!ph.contains("CartesianProduct"), ph)
    val pk = plan("x142_kmv_distinct")
    // k-mins is TakeOrderedAndProject over the dedup — not a global sort
    assert(pk.contains("TakeOrderedAndProject"), pk)
    assert(pk.contains("HashAggregate"), pk)
    // the per-partition k-smallest pre-cut sits UNDER the distinct's
    // exchange, so the shuffle carries ≤ n_partitions·k rows, never the
    // O(NDV) distinct-hash relation — the r12 verdict's kmvMins item
    val treeK = pk.linesIterator.takeWhile(!_.matches("^\\(\\d+\\) .*")).toSeq
    val iMap = treeK.indexWhere(_.contains("MapPartitions"))
    val iEx = treeK.indexWhere(_.contains("Exchange"))
    assert(iMap >= 0 && iEx >= 0 && iEx < iMap,
      s"pre-cut must be below the exchange:\n${treeK.mkString("\n")}")
  }

  test("x138b salted as-of: NO single-partition keyed window; carry join broadcasts") {
    val p = plan("x138b_asof_salted")
    // phase-1 carry-forward window partitions by (key, bucket) — a hot
    // key's history spreads; the ONLY per-key window runs over the
    // per-bucket summary (bucket count rows), and the carry-in joins
    // back via broadcast of that tiny relation
    assert(treeCount(p, "Window") == 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the in-bucket window's spec carries the bucket column: its sort
    // prefix is (__k, __b) — the salted partitioning made it to the plan
    assert(p.contains("__b"), p)
  }

  test("x140/x141 order statistics: keyed windows over distinct values, broadcast bounds") {
    val pc = plan("x140_conformal_threshold")
    assert(pc.contains("BroadcastHashJoin"), pc)
    assert(!pc.contains("CartesianProduct") &&
      !pc.contains("SortMergeJoin"), pc)
    val pw = plan("x141_winsorized_stats")
    assert(pw.contains("BroadcastHashJoin"), pw)
    assert(!pw.contains("CartesianProduct") &&
      !pw.contains("SortMergeJoin"), pw)
  }

  test("x144 shrinkage: one group aggregation + a 1-row broadcast, nothing else") {
    val p = plan("x144_bayes_average")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("x145/x146 weight/calibration audits: aggregations + broadcast bounds only") {
    val pe = plan("x145_ess_weights")
    // two-stage normalization = two group aggregations with the tiny
    // per-group bounds broadcast back between them — never a sort or a
    // shuffled join of raw rows
    assert(pe.contains("HashAggregate") && pe.contains("BroadcastHashJoin"), pe)
    assert(!pe.contains("SortMergeJoin") && !pe.contains("CartesianProduct"), pe)
    val pb = plan("x146_brier_decomp")
    // one aggregation onto ≤ bins keys; everything after runs on that
    // tiny relation (the 1-row totals ride a broadcast)
    assert(pb.contains("HashAggregate"), pb)
    assert(!pb.contains("SortMergeJoin") && !pb.contains("CartesianProduct"), pb)
  }

  test("x147 Kaplan–Meier: per-user agg, windows over distinct durations only") {
    val p = plan("x147_kaplan_meier")
    // the raw events reduce to per-user rows, then to (cohort, duration)
    // rows BEFORE any window — the cumulative passes run over value
    // cardinality, not event rows
    assert(p.contains("HashAggregate") && p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    val tree = p.linesIterator.takeWhile(!_.matches("^\\(\\d+\\) .*")).toSeq
    val iAgg = tree.lastIndexWhere(_.contains("HashAggregate"))
    val iWin = tree.indexWhere(_.contains("Window"))
    assert(iWin < iAgg, // formatted tree prints top-down: window ABOVE agg
      s"window must sit above the (grp, t) aggregation:\n${tree.mkString("\n")}")
  }

  test("x148 frequent pairs: L1 broadcast prune, basket equi-join, no cartesian") {
    val p = plan("x148_freq_pairs")
    assert(p.contains("BroadcastHashJoin"), p)
    // the only BNLJ is the accepted broadcast 1-row n_baskets attach
    // (Cross) — an INNER BNLJ would mean the pair join degraded to
    // all-pairs, the x40 convention
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")), p)
  }

  test("x149 KMV overlap: per-side k-min pre-cut under the exchange, k-row tail") {
    val p = plan("x149_kmv_overlap")
    // both sides inherit kmvMins' bounded MapPartitions pre-cut; the
    // set algebra below runs on ≤ 2k rows
    assert(p.contains("MapPartitions") && p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x150 typo dedup: block equi-join feeds the native DL — no all-pairs") {
    val p = plan("x150_typo_neardup")
    assert(p.contains("damerauLevenshtein") || p.contains("damerau"), p)
    assert(!p.contains("CartesianProduct"), p)
    // EXACTLY one BNLJ is allowed since r15: the broadcast 1-ROW
    // block-regime guard (the raise_error tripwire from the r14
    // ADVICE) crossJoins the output — constant work. The CANDIDATE
    // join itself must stay an equi-join; a second BNLJ would mean an
    // all-pairs fallback crept back in. Formatted explain prints each
    // node twice (tree line + details section), so one node = 2 hits.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 2, p)
    // the join key is the block — an equi-join (broadcast or SMJ), so
    // the O(|s|²) matrix only ever runs on blocked candidates
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("x151 PII scan: row-local regex then one group aggregation — no join") {
    val p = plan("x151_pii_scan")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("x152/x153 graph + info-gain: equi-joins and tiny aggregations only") {
    val pg = plan("x152_dup_graph_stats")
    assert(pg.contains("HashAggregate"), pg)
    assert(!pg.contains("CartesianProduct"), pg)
    val pi = plan("x153_info_gain")
    assert(pi.contains("HashAggregate"), pi)
    assert(!pi.contains("CartesianProduct") &&
      !pi.contains("SortMergeJoin"), pi)
  }

  test("x154 rolling KMV: per-day bounded pre-cut, day-keyed windows only") {
    val p = plan("x154_kmv_rolling")
    // the per-partition per-day k-heap sits under the dedup exchange —
    // the shuffle carries ≤ n_partitions·days·k rows, never raw events
    assert(p.contains("MapPartitions"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x155/x156 drift + slice AUC: value-cardinality passes, keyed windows") {
    val pp = plan("x155_psi_drift")
    assert(pp.contains("HashAggregate"), pp)
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("SortMergeJoin"), pp)
    val pa = plan("x156_auc_by_slice")
    // the cumulative pass is keyed by slice over distinct scores
    assert(pa.contains("Window") && pa.contains("HashAggregate"), pa)
    assert(!pa.contains("CartesianProduct"), pa)
  }

  test("x157/x158 weighted stats: keyed cumulative pass, tiny margin cross") {
    val pw = plan("x157_weighted_quantiles")
    // cumulative weight runs keyed by group over distinct values
    assert(pw.contains("Window") && pw.contains("HashAggregate"), pw)
    assert(!pw.contains("CartesianProduct"), pw)
    val pk = plan("x158_cohen_kappa")
    // the margin cross is the accepted broadcast Cross over
    // categories-sized relations — never a CartesianProduct
    assert(pk.contains("HashAggregate"), pk)
    assert(!pk.contains("CartesianProduct"), pk)
    assert(!pk.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")), pk)
  }

  test("NO registered query plans a CartesianProduct — the global ban, CI-enforced") {
    // the repo's scale claim bans the node outright (accepted tiny-side
    // cross joins must carry a broadcast hint and plan as BNLJ Cross);
    // sweeping every registered query makes the claim a regression net
    // instead of a README sentence
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = plan(name)
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: $offenders")
  }

  test("PLANS.md spans the full registered surface — one section per query, none FAILED") {
    // the committed plan audit drifted behind the surface twice (r13:
    // 228 sections vs 244 queries) — pin section count to
    // SparkEntry.queries.size so adding a query without regenerating
    // PLANS.md (runMain graft.tools.PlanDump) fails CI, and a FAILED
    // section (a query PlanDump could not build) can never ship silently
    val plansFile = new java.io.File("PLANS.md")
    assert(plansFile.exists, "PLANS.md missing — run graft.tools.PlanDump")
    // explicit UTF-8: PLANS.md carries multibyte plan glyphs (×, —)
    // and the platform default charset is not guaranteed
    import scala.jdk.CollectionConverters._
    val ls = java.nio.file.Files
      .readAllLines(plansFile.toPath, java.nio.charset.StandardCharsets.UTF_8)
      .asScala
    val (sections, failed) =
      (ls.count(_.startsWith("## ")), ls.count(_.startsWith("FAILED:")))
    assert(sections == SparkEntry.queries.size,
      s"PLANS.md has $sections sections but ${SparkEntry.queries.size} " +
        "queries are registered — regenerate with graft.tools.PlanDump")
    assert(failed == 0, s"PLANS.md carries $failed FAILED sections")
  }

  test("x198 permutation ranks are bucket-partitioned — no corpus-sized window partition") {
    val p = plan("x198_perm_test")
    // the r15-verdict scale defect: Window.partitionBy(pb) put the
    // ENTIRE corpus in each of B partitions (B single-task corpus
    // sorts). The fix ranks only within (pb, bkt) hash-prefix buckets;
    // any windowspec that orders the row-grain relation by the
    // permutation hash h must therefore carry BOTH pb and bkt in its
    // partition clause
    val rowGrainSpecs = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("h#"))
      .toSeq
    assert(rowGrainSpecs.nonEmpty, p.linesIterator.take(40).mkString("\n"))
    rowGrainSpecs.foreach { l =>
      assert(l.contains("bkt#"),
        s"h-ordered window not bucket-partitioned:\n$l")
    }
    // and the only pb-only window runs over the (pb, bkt) COUNT
    // relation (ordered by bkt, ≤ 256 rows per permutation), never by h
    p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && !l.contains("bkt#"))
      .foreach { l => assert(!l.contains("h#"), l) }
    assert(!p.contains("CartesianProduct"), p)
  }

  test("audit: no registered query partitions a corpus-grain window by a permutation/replica index alone") {
    // the x198-class shape: Window.partitionBy over a BOUNDED-
    // cardinality replication key (permutation index, bootstrap
    // replica) funnels the whole corpus through one task per replica —
    // x198 was the only instance found in the r15 audit and is fixed;
    // this pin turns that manual audit into CI by freezing the source:
    // a single-key window over a replication-index column may not
    // reappear anywhere in main sources
    val srcRoot = java.nio.file.Paths.get("src/main/scala/graft")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(srcRoot).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    // replication-index spellings used anywhere in the repo (pb =
    // permutation, rep/b_id = bootstrap replica, perm) — none of these
    // may be the SOLE partition key of a row-grain window. The one
    // legitimate pb-only window (x198's cumulative-offset pass) orders
    // by bkt over the ≤ B·256-row count relation, so the ban for pb is
    // its row-grain spelling (ordered by the permutation hash h)
    val banned =
      s"""partitionBy(col("pb")).orderBy(col("h")""" +:
        Seq("rep", "perm", "b_id", "boot")
          .map(k => s"""partitionBy(col("$k"))""")
    val hits = for {
      f <- files
      text = new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)
      // collapse whitespace so multi-line builder chains match too
      flat = text.replaceAll("\\s+", "")
      b <- banned if flat.contains(b)
    } yield s"$f: $b"
    assert(hits.isEmpty,
      "corpus-grain window partitioned by a replication index alone:\n" +
        hits.mkString("\n"))
  }

  test("q01 aggregation is whole-stage codegen'd hash aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"))
    // AQE resolves codegen stages only once executed: run it, then read
    // the FINAL plan — "*(n)" prefixes mark whole-stage-codegen spans
    val df = SparkEntry.queries("q01_pricing_summary")(spark, dir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("*(") && fin.contains("HashAggregate"),
      fin.linesIterator.take(15).mkString("\n"))
  }
}
