package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operator inventory (SURVEY.md §2B X1–X18): scans, projections,
  * filters, every join shape, aggregation, top-k — each as a named DataFrame
  * query with a DuckDB-oracle twin in [[oracles]].
  *
  * Scale notes (100 TB design intent, verified on the sf plans):
  *  - dimension tables (region/nation/supplier/customer at TPC-H ratios) are
  *    broadcast — no shuffle of the fact side for q03/q05/q06/q07;
  *  - aggregations are partial (map-side combine) by construction — integer
  *    sums are associative, so Catalyst plans HashAggregate(partial→final);
  *  - top-k is `orderBy().limit(k)` which Spark plans as
  *    TakeOrderedAndProject — no global sort materialization.
  */
object Relational {

  /** X1/X2/X8 — TPC-H Q1-style pricing summary: scan + filter (pushed to
    * parquet) + multi-aggregate groupBy. Money math in exact integer cents.
    * Reference analog: the only aggregation the reference has is its stats
    * loop (RePlayer.java:145-162); this is the general form. */
  def q01(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
          .as("sum_disc_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
          * (lit(100L) + cents(col("l_tax")))) / 1000000.0).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(cents(col("l_extendedprice"))) / count(lit(1)) / 100.0).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** X2 — projection + conjunctive predicate, pushed down to the parquet
    * scan (PushedFilters in explain). Raw column passthrough: no arithmetic,
    * so values are byte-identical to the oracle's. */
  def q02(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** X3 — multi-way inner equi-join with broadcast dimensions:
    * orders ⋈ customer ⋈ nation ⋈ region, revenue per region/nation.
    * nation/region/customer are tiny at TPC-H ratios → broadcast-hash join,
    * zero shuffle on the orders fact side at any scale. */
  def q03(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    val n = t(s, d, "nation")
    val r = t(s, d, "region")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((sum(cents(col("o_totalprice"))) / 100.0).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** X4 — left outer join preserving customers with zero orders. */
  def q04(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_totalprice") > 100000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_big_orders"))
      .orderBy(col("c_custkey"))
  }

  /** X4 — full outer join: per-nation customer vs supplier account
    * balances; nations may lack suppliers (and vice versa on filtered
    * subsets), so both null sides occur. */
  def q04bFullOuter(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").filter(col("c_acctbal") > 9000.0)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_rich_cust"))
    val su = t(s, d, "supplier").filter(col("s_acctbal") > 5000.0)
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_rich_supp"))
    c.join(su, Seq("nk"), "full_outer")
      .select(col("nk"),
        coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"),
        coalesce(col("n_rich_supp"), lit(0L)).as("n_rich_supp"))
      .orderBy(col("nk"))
  }

  /** X4 — right outer join: all orders kept, customer attrs where present
    * (right side is the preserved side). */
  def q04cRightOuter(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, d, "orders").filter(col("o_totalprice") > 350000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "right_outer")
      .select(col("o_orderkey"), col("o_custkey"),
        coalesce(col("c_name"), lit("<none>")).as("c_name"))
      .orderBy(col("o_orderkey"))
  }

  /** X5 — left-semi join (EXISTS): customers having any urgent order. */
  def q05(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** X5 — left-anti join (NOT EXISTS): customers with no very large order. */
  def q06(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** X6 — theta/range join: equi on nation + inequality on balance.
    * Planned as broadcast-hash on the equi key with the range predicate as
    * a post-join filter — the scalable shape for equi+theta. */
  def q07(s: SparkSession, d: String): DataFrame = {
    val su = t(s, d, "supplier")
    val c = t(s, d, "customer")
    su.join(c, su("s_nationkey") === c("c_nationkey") &&
        c("c_acctbal") > su("s_acctbal"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_richer_customers"))
      .orderBy(col("s_suppkey"))
  }

  /** Skew-resistant two-phase (salted) aggregation: phase 1 aggregates on
    * (key, salt) spreading a hot key over 16 reducers, phase 2 merges the
    * partials. Result-identical to the direct groupBy (integer sums are
    * associative) — the oracle is the plain aggregation. At 100 TB this is
    * the pattern for heavy-hitter keys; AQE's skew handling covers joins,
    * but aggregation salting is explicit. */
  def q25SaltedAgg(s: SparkSession, d: String): DataFrame = {
    val salted = t(s, d, "lineitem")
      .withColumn("salt", pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(cents(col("l_extendedprice"))).as("part_cents"),
        count(lit(1)).as("part_n"))
    salted.groupBy(col("l_returnflag"))
      .agg((sum(col("part_cents")) / 100.0).as("revenue"),
        sum(col("part_n")).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** X14 — sort + limit top-k; plans as TakeOrderedAndProject (per-partition
    * heap + driver merge), never a full global sort. Tie-broken on the
    * unique key for determinism. */
  def q10(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Pivot — long→wide reshape with an EXPLICIT category list (the
    * two-pass "discover values then pivot" form collects distinct values
    * to the driver; pinning the list keeps the plan single-pass and the
    * schema static, which is the only scalable form anyway). Plans as one
    * partial→final hash aggregation of conditional counts. */
  def q14Pivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("O", "F", "P"))
      .select(col("o_custkey"), col("O").as("n_open"),
        col("F").as("n_filled"), col("P").as("n_partial"))
      .orderBy(col("o_custkey"))

  /** Unpivot/melt — wide→long reshape via `Dataset.unpivot` (UNPIVOT in
    * SQL). Value columns unified to long (exact integer cents for money)
    * so the melted value column has one portable type. */
  def q14bUnpivot(s: SparkSession, d: String): DataFrame = {
    val agg = t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n_rows"))
    agg.unpivot(
      Array(col("l_returnflag")),
      Array(col("sum_qty"), col("sum_price_cents"), col("n_rows")),
      "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  /** MERGE/upsert core — the incremental-maintenance operator (SCD-style):
    * apply a changes relation to a base relation by key →
    * base ⟗ changes (one shuffle join; zero-shuffle sort-merge when both
    * sides are bucketed on the key via TrainingData.saveBucketed), with a
    * `merge_action` provenance column: a keyed change overwrites the base
    * row ('updated'), an unmatched change appends ('inserted'), an
    * untouched base row passes through ('kept'). Both inputs must have
    * identical schemas; deletes are a filter, not a merge concern.
    *
    * Row provenance rides on MARKER columns, not key-nullness: a change
    * row overwrites every column including an explicit NULL (the
    * per-column `coalesce` form silently kept the old value there), and
    * a change with a NULL merge key — which an equi-join can never match
    * — is correctly labeled 'inserted', not 'kept'. Precondition (same
    * as SQL MERGE, which raises on multiple matches): `changes` must be
    * unique per key, or matched base rows fan out one output row per
    * matching change. */
  def upsert(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val cols = base.columns
    require(changes.columns.sameElements(cols),
      s"upsert needs identical schemas: ${cols.toSeq} vs ${changes.columns.toSeq}")
    require(!cols.contains("__from_change") && !cols.contains("__from_base"),
      "upsert uses helper columns __from_base/__from_change; rename yours first")
    val b = base.withColumn("__from_base", lit(true)).as("b")
    val c = changes.withColumn("__from_change", lit(true)).as("c")
    b.join(c, col(s"b.$key") === col(s"c.$key"), "full_outer")
      .select(cols.map(n =>
        when(col("c.__from_change").isNotNull, col(s"c.$n"))
          .otherwise(col(s"b.$n")).as(n)) :+
        when(col("c.__from_change").isNotNull && col("b.__from_base").isNotNull,
          "updated")
          .when(col("c.__from_change").isNotNull, "inserted")
          .otherwise("kept").as("merge_action"): _*)
  }

  /** X34 — MERGE/upsert fixture: a deterministic change set against
    * `orders` (every 10th key repriced, every 7th≡3 key re-keyed negative
    * as an insert) applied via [[upsert]]. */
  def q26MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
    val inserts = base.filter(col("o_orderkey") % 7 === 3)
      .withColumn("o_orderkey", -col("o_orderkey"))
    upsert(base, updates.unionByName(inserts), "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  /** X84 — referential-integrity audit of the documents ↔ embeddings
    * enrichment join (the by-key/by-row coverage report a pipeline runs
    * before trusting a join). The fixture tables share a key set, so the
    * embedding side carries a q26-style deterministic change set —
    * every 7th key dropped (left orphans), every 11th re-keyed negative
    * (right orphans), every 13th duplicated (by-row ≠ by-key) — so all
    * three statuses and the row/key distinction are exercised. Fixture
    * binding of [[graft.api.TrainingData.integrityAudit]]. */
  def x84IntegrityAudit(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings").select(col("vec_id"))
    val right = e.filter(col("vec_id") % 7 =!= 0)
      .unionAll(e.filter(col("vec_id") % 11 === 0)
        .select((-col("vec_id") - 1).as("vec_id")))
      .unionAll(e.filter(col("vec_id") % 13 === 0))
    graft.api.TrainingData.integrityAudit(
      t(s, d, "documents"), "doc_id", right, "vec_id")
      .orderBy(col("status"))
  }

  /** X110 — k-anonymity / l-diversity release audit on customer rows:
    * quasi-identifiers (nation, market segment), sensitive column
    * acctbal, bounds k=8 / l=3 — every reported row is a group a privacy
    * pass would suppress or generalize before release. Fixture binding
    * of [[graft.api.TrainingData.kAnonymityAudit]]. */
  def x110KAnonymity(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.kAnonymityAudit(
      t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"), "c_acctbal",
      k = 8L, l = 3L)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  /** X129 — one-pass profile of the documents table: per column the
    * row/non-null/exact-distinct counts and lexicographic min/max — the
    * ANALYZE a pipeline runs before trusting a new dump. The multiple
    * exact count(DISTINCT) plan as ONE aggregation via Expand. Fixture
    * binding of [[graft.api.TrainingData.tableProfile]]. */
  def x129TableProfile(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.tableProfile(t(s, d, "documents"))
      .orderBy(col("column_name"))

  /** X129b — the profiler over FLOAT columns (lineitem quantities,
    * discounts, taxes): Double columns profile as their micro-quantized
    * BIGINT view (round(v·10⁶)), so NDV/min/max stay engine-portable
    * where raw float FORMATTING is not — the round-11 carry-forward
    * closed. The binding picks the low-cardinality float columns: the
    * portability property is what x129b checks, while the exact-NDV
    * Expand cost of a high-cardinality column (l_extendedprice: one
    * distinct state per row) is x129's documented story with the
    * documented hashSample/approx alternative at 100 TB. */
  def x129bProfileFloats(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.tableProfile(
      t(s, d, "lineitem").select(col("l_quantity"),
        col("l_tax"), col("l_discount"), col("l_returnflag")))
      .orderBy(col("column_name"))

  /** X142 — KMV portable distinct sketch over lineitem's price cents
    * (the high-NDV column the exact profiler pays for): k = 256 minimum
    * sha-derived 52-bit hashes → ndv_est within ~1/√k of exact, every
    * step integer arithmetic the oracle replays — the hash-checkable
    * companion to q09's engine-internal HLL, and a mergeable summary
    * (union two tables' k-mins, re-take k smallest). Fixture binding of
    * [[graft.api.TrainingData.kmvDistinct]]. */
  def x142KmvDistinct(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.kmvDistinct(
      t(s, d, "lineitem")
        .select(expr("CAST(round(l_extendedprice*100,0) AS BIGINT)")
          .as("cents")),
      "cents", k = 256)

  /** X142b — the KMV merge law hash-checked: per-parity-shard k-mins
    * summaries unioned and re-reduced ([[graft.api.TrainingData
    * .kmvEstimateFromMins]] re-takes the k smallest — exactly the k
    * smallest of the union), held to the SAME oracle as x142's direct
    * form. Result invariance under merging IS the check (the x139b /
    * x33b pattern) — the property HLL register merging never gets
    * hash-checked for. */
  def x142bKmvMerged(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice*100,0) AS BIGINT)").as("cents"))
    def mins(pred: org.apache.spark.sql.Column) =
      graft.api.TrainingData.kmvMins(
        li.filter(pred).select(col("cents")), "cents", k = 256)
    graft.api.TrainingData.kmvEstimateFromMins(
      mins(col("l_orderkey") % 2 === 0)
        .unionByName(mins(col("l_orderkey") % 2 =!= 0)),
      k = 256)
  }

  /** X149 — KMV set-operation overlap between two user populations
    * (click-ers vs view-ers): union / intersection / difference NDV
    * estimates and the Jaccard estimate, from two 256-row k-mins
    * summaries — "how much do these two corpora overlap" priced at
    * sketch cost (never a join of the full key sets), with every step
    * integer arithmetic the oracle replays. Fixture binding of
    * [[graft.api.TrainingData.kmvOverlap]]. */
  def x149KmvOverlap(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
    graft.api.TrainingData.kmvOverlap(
      ev.filter(col("event_type") === "click").select(col("user_id")),
      ev.filter(col("event_type") === "view").select(col("user_id")),
      "user_id", k = 256)
  }

  /** X154 — rolling 7-day distinct users from mergeable per-day KMV
    * sketches (k = 64): each output day unions the last week's per-day
    * k-mins summaries and re-takes the k smallest — the x142b merge law
    * applied to a SLIDING WINDOW, pricing "rolling distinct over
    * 100 TB" at days·k rows of state instead of a window-sized exact
    * dedup per day. Exact below k. Fixture binding of
    * [[graft.api.TrainingData.kmvRollingDistinct]]. */
  def x154KmvRolling(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.kmvRollingDistinct(
      t(s, d, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("ts"), col("user_id")),
      "ts", "user_id", k = 64, windowDays = 7)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x149_kmv_overlap" -> (x149KmvOverlap _),
    "x154_kmv_rolling" -> (x154KmvRolling _),
    "x129_table_profile" -> (x129TableProfile _),
    "x129b_profile_floats" -> (x129bProfileFloats _),
    "x142_kmv_distinct" -> (x142KmvDistinct _),
    "x142b_kmv_merged" -> (x142bKmvMerged _),
    "x110_k_anonymity" -> (x110KAnonymity _),
    "x84_integrity_audit" -> (x84IntegrityAudit _),
    "q01_pricing_summary" -> (q01 _),
    "q26_merge_upsert" -> (q26MergeUpsert _),
    "q02_filter_project" -> (q02 _),
    "q03_join_revenue" -> (q03 _),
    "q04_outer_join" -> (q04 _),
    "q04b_full_outer" -> (q04bFullOuter _),
    "q04c_right_outer" -> (q04cRightOuter _),
    "q05_semi_join" -> (q05 _),
    "q06_anti_join" -> (q06 _),
    "q07_theta_join" -> (q07 _),
    "q10_topk" -> (q10 _),
    "q14_pivot" -> (q14Pivot _),
    "q14b_unpivot" -> (q14bUnpivot _),
    "q25_salted_agg" -> (q25SaltedAgg _))

  // 52-bit sha coordinate: the first 13 lowercase-hex chars parsed via
  // ascii() arithmetic (the hash16 recipe widened — both engines emit
  // lowercase sha256 hex and agree on ascii())
  private def hash52Sql(valExpr: String): String = {
    val digit = (i: Int) => {
      val a = s"ascii(substring(sha256(CAST($valExpr AS VARCHAR)), $i, 1))"
      s"(CASE WHEN $a >= 97 THEN $a - 87 ELSE $a - 48 END)"
    }
    (2 to 13).foldLeft(s"CAST(${digit(1)} AS BIGINT)") {
      (acc, i) => s"($acc * 16 + ${digit(i)})"
    }
  }

  // KMV replay: distinct 52-bit sha coordinates, k smallest, the same
  // integer estimator. SHARED by x142 (direct) and x142b (per-shard
  // merge) — the k smallest of a union of per-shard k-smallest sets IS
  // the k smallest of the union, so merge invariance is the check
  private val kmvOracle =
    s"""WITH h AS (
       |  SELECT DISTINCT ${hash52Sql(
           "CAST(round(l_extendedprice*100,0) AS BIGINT)")} AS h
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |mins AS (SELECT h FROM h ORDER BY h LIMIT 256),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n_hashes,
       |             CAST(max(h) AS BIGINT) AS kth_min
       |      FROM mins)
       |SELECT 256 AS k, n_hashes, kth_min,
       |  CASE WHEN n_hashes < 256 THEN n_hashes
       |       ELSE (CAST(255 AS BIGINT) * 4503599627370496) // kth_min
       |  END AS ndv_est
       |FROM a""".stripMargin

  // KMV overlap replay: per-side 52-bit sha coordinates, per-side
  // 256-mins, tagged union deduped by hash, the k smallest WITH flags,
  // then the same integer estimators
  private val kmvOverlapOracle = {
    def side(et: String) =
      s"""SELECT h FROM (
         |  SELECT DISTINCT ${hash52Sql("user_id")} AS h
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |    AND event_type = '$et')
         |ORDER BY h LIMIT 256""".stripMargin
    s"""WITH ma AS (${side("click")}),
       |mb AS (${side("view")}),
       |u AS (
       |  SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |    SELECT h, 1 AS in_a, 0 AS in_b FROM ma
       |    UNION ALL
       |    SELECT h, 0 AS in_a, 1 AS in_b FROM mb)
       |  GROUP BY h ORDER BY h LIMIT 256),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_union_hashes,
       |    CAST(max(h) AS BIGINT) AS kth_min,
       |    CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
       |    CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS n_only_a,
       |    CAST(sum(in_b * (1 - in_a)) AS BIGINT) AS n_only_b
       |  FROM u),
       |est AS (
       |  SELECT n_union_hashes, n_both, n_only_a, n_only_b,
       |    CASE WHEN n_union_hashes < 256 THEN n_union_hashes
       |         ELSE CAST((CAST(255 AS BIGINT) * 4503599627370496)
       |           // kth_min AS BIGINT)
       |    END AS union_est
       |  FROM a WHERE n_union_hashes > 0)
       |SELECT 256 AS k, n_union_hashes, n_both, union_est,
       |  CAST((n_both * union_est) // n_union_hashes AS BIGINT)
       |    AS inter_est,
       |  CAST((1000000 * n_both) // n_union_hashes AS BIGINT)
       |    AS jaccard_micros,
       |  CAST((n_only_a * union_est) // n_union_hashes AS BIGINT)
       |    AS only_a_est,
       |  CAST((n_only_b * union_est) // n_union_hashes AS BIGINT)
       |    AS only_b_est
       |FROM est""".stripMargin
  }

  // rolling-KMV replay: per-day distinct 52-bit coordinates, per-day
  // k-mins via a day-keyed rank, each day's summary serving the 7
  // output days at or after it (clamped to observed days), re-rank to
  // k per output day, the same integer estimator
  private val kmvRollingOracle =
    s"""WITH dh AS (
       |  SELECT DISTINCT epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000
       |      AS day,
       |    ${hash52Sql("user_id")} AS h
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
       |daily AS (
       |  SELECT day, h FROM (
       |    SELECT day, h,
       |      row_number() OVER (PARTITION BY day ORDER BY h) AS rn
       |    FROM dh)
       |  WHERE rn <= 64),
       |days AS (SELECT DISTINCT day FROM daily),
       |served AS (
       |  SELECT d.day AS out_day, s.day, s.h
       |  FROM daily s JOIN days d ON d.day BETWEEN s.day AND s.day + 6),
       |ranked AS (
       |  SELECT out_day, h,
       |    row_number() OVER (PARTITION BY out_day ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT out_day, h FROM served)),
       |est AS (
       |  SELECT out_day, CAST(count(*) AS BIGINT) AS n_hashes,
       |    CAST(max(h) AS BIGINT) AS kth_min
       |  FROM ranked WHERE rn <= 64 GROUP BY 1),
       |wd AS (SELECT out_day,
       |       CAST(count(DISTINCT day) AS BIGINT) AS n_days_in_window
       |       FROM served GROUP BY 1)
       |SELECT est.out_day AS day, n_days_in_window, n_hashes, kth_min,
       |  CASE WHEN n_hashes < 64 THEN n_hashes
       |       ELSE (CAST(63 AS BIGINT) * 4503599627370496) // kth_min
       |  END AS ndv_est
       |FROM est JOIN wd USING (out_day) ORDER BY day""".stripMargin

  val oracles: Map[String, String] = Map(
    "x149_kmv_overlap" -> kmvOverlapOracle,
    "x154_kmv_rolling" -> kmvRollingOracle,
    "x142b_kmv_merged" -> kmvOracle,
    "x142_kmv_distinct" -> kmvOracle,
    // profile replay: one SELECT per column unioned — n_rows from the
    // whole table, count(col) non-null, exact DISTINCT, min/max as
    // VARCHAR (binary UTF-8 comparison in both engines)
    "x129_table_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
           | (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows,
           | CAST(count($c) AS BIGINT) AS n_nonnull,
           | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           | CAST(min($c) AS VARCHAR) AS min_str,
           | CAST(max($c) AS VARCHAR) AS max_str
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // float-column profile replay: Double columns go through the same
    // micro quantization (round(v*1e6) AS BIGINT) in both engines, so
    // the min/max strings are integer prints — portable where raw float
    // formatting is not
    "x129b_profile_floats" -> {
      val cols = Seq("l_quantity" -> true,
        "l_tax" -> true, "l_discount" -> true,
        "l_returnflag" -> false)
      cols.map { case (c, isFloat) =>
        val v = if (isFloat)
          s"CAST(round(CAST($c AS DOUBLE) * 1000000.0, 0) AS BIGINT)"
        else c
        s"""SELECT '$c' AS column_name,
           | (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
           | CAST(count($v) AS BIGINT) AS n_nonnull,
           | CAST(count(DISTINCT $v) AS BIGINT) AS n_distinct,
           | CAST(min($v) AS VARCHAR) AS min_str,
           | CAST(max($v) AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // one quasi-identifier aggregation, HAVING on both privacy bounds
    "x110_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS group_size,
        |  CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_div
        |FROM customer
        |GROUP BY 1, 2
        |HAVING count(*) < 8 OR count(DISTINCT c_acctbal) < 3
        |ORDER BY 1, 2""".stripMargin,
    // by-key/by-row coverage replay: per-side (key, count) reduction,
    // one full-outer join, presence-flag status
    "x84_integrity_audit" ->
      """WITH r0 AS (
        |  SELECT vec_id FROM embeddings WHERE vec_id % 7 <> 0
        |  UNION ALL SELECT -vec_id - 1 FROM embeddings WHERE vec_id % 11 = 0
        |  UNION ALL SELECT vec_id FROM embeddings WHERE vec_id % 13 = 0),
        |l AS (SELECT doc_id AS k, count(*) AS nl FROM documents GROUP BY 1),
        |r AS (SELECT vec_id AS k, count(*) AS nr FROM r0 GROUP BY 1),
        |j AS (
        |  SELECT CASE WHEN nl IS NOT NULL AND nr IS NOT NULL THEN 'both'
        |              WHEN nl IS NOT NULL THEN 'left_only'
        |              ELSE 'right_only' END AS status, nl, nr
        |  FROM l FULL OUTER JOIN r USING (k))
        |SELECT status, count(*) AS n_keys,
        |  coalesce(CAST(sum(nl) AS BIGINT), 0) AS n_left_rows,
        |  coalesce(CAST(sum(nr) AS BIGINT), 0) AS n_right_rows
        |FROM j GROUP BY status
        |ORDER BY status""".stripMargin,
    "q26_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         TRUE AS from_base FROM orders),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice + 100.0 AS o_totalprice, TRUE AS from_change
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT -o_orderkey AS o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice, TRUE AS from_change
        |  FROM base WHERE o_orderkey % 7 = 3)
        |SELECT
        | CASE WHEN c.from_change THEN c.o_orderkey ELSE b.o_orderkey END AS o_orderkey,
        | CASE WHEN c.from_change THEN c.o_custkey ELSE b.o_custkey END AS o_custkey,
        | CASE WHEN c.from_change THEN c.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
        | CASE WHEN c.from_change THEN c.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
        | CASE WHEN c.from_change AND b.from_base THEN 'updated'
        |      WHEN c.from_change THEN 'inserted'
        |      ELSE 'kept' END AS merge_action
        |FROM base b FULL JOIN chg c ON b.o_orderkey = c.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS sum_base_price,
        | sum(CAST(round(l_extendedprice*100,0) AS BIGINT)*(100 - CAST(round(l_discount*100,0) AS BIGINT)))/10000.0 AS sum_disc_price,
        | sum(CAST(round(l_extendedprice*100,0) AS BIGINT)*(100 - CAST(round(l_discount*100,0) AS BIGINT))*(100 + CAST(round(l_tax*100,0) AS BIGINT)))/1000000.0 AS sum_charge,
        | sum(l_quantity)/count(*) AS avg_qty,
        | sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/count(*)/100.0 AS avg_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
        |  AND l_discount >= 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_revenue" ->
      """SELECT r_name, n_name,
        | sum(CAST(round(o_totalprice*100,0) AS BIGINT))/100.0 AS revenue,
        | count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q04_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big_orders
        |FROM customer LEFT JOIN (
        |  SELECT * FROM orders WHERE o_totalprice > 100000.0
        |) ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q04b_full_outer" ->
      """SELECT coalesce(c.nk, s.nk) AS nk,
        | coalesce(n_rich_cust, 0) AS n_rich_cust,
        | coalesce(n_rich_supp, 0) AS n_rich_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_rich_cust
        |      FROM customer WHERE c_acctbal > 9000.0 GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_rich_supp
        |      FROM supplier WHERE s_acctbal > 5000.0 GROUP BY 1) s
        |  ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,
    "q04c_right_outer" ->
      """SELECT o_orderkey, o_custkey, coalesce(c_name, '<none>') AS c_name
        |FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
        |RIGHT JOIN (SELECT * FROM orders WHERE o_totalprice > 350000.0) o
        |  ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q07_theta_join" ->
      """SELECT s_suppkey, count(*) AS n_richer_customers
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q10_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q14_pivot" ->
      """SELECT o_custkey,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q14b_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |   sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
        |   sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS sum_price_cents,
        |   count(*) AS n_rows
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, CAST(sum_qty AS BIGINT) AS value FROM a
        |UNION ALL SELECT l_returnflag, 'sum_price_cents', CAST(sum_price_cents AS BIGINT) FROM a
        |UNION ALL SELECT l_returnflag, 'n_rows', CAST(n_rows AS BIGINT) FROM a
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q25_salted_agg" ->
      """SELECT l_returnflag,
        | sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS revenue,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
