package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar-function and set-operation inventory (SURVEY.md §2B X8–X10,
  * X15–X20): distinct/approx aggregation, union/intersect/except (set and
  * multiset), string/date/math/array/JSON functions — all codegen'd
  * built-ins, no UDFs in the hot path. */
object Functions {

  /** X9 — distinct aggregation: per-flag distinct parts/suppliers + distinct
    * quantity sum (exact: quantities are integral doubles). */
  def q08Distinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        sum_distinct(col("l_quantity")).as("sum_dist_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** X10 — HyperLogLog++ approximate distinct. No SQL oracle (estimator
    * differs per engine) → driver records a rows-only check; the ScalaTest
    * spec bounds the estimate against the exact count instead. */
  def q09Approx(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        approx_count_distinct(col("event_id"), 0.02).as("approx_events"))
      .orderBy(col("event_type"))

  /** X3/X8 — large-⋈-large equi-join (lineitem ⋈ orders). At 100 TB both
    * sides exceed the broadcast threshold → shuffled sort-merge join (plan
    * verified with autoBroadcastJoinThreshold=-1); at test SF orders fits
    * under 10 MB and Catalyst rightly broadcasts it instead — the
    * size-adaptive pick is the point, not a fixed strategy. */
  def q03bLargeJoin(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val o = t(s, d, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg((sum(cents(col("l_extendedprice"))) / 100.0).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** X8 — exact percentiles (median, p90) on integer cents: sort-based
    * exact percentile with linear interpolation; interpolation happens on
    * exact integers so both engines agree (rounded at 4). */
  def q08bPercentiles(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.5)") / 100.0, 4)
          .as("median_price"),
        round(expr("percentile(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.9)") / 100.0, 4)
          .as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** X8 (scale path) — approximate percentiles via Spark's bounded-memory
    * quantile sketch (Greenwald-Khanna): the form that survives a stratum
    * with billions of distinct values, where exact `percentile`'s
    * buffer (all distinct values) cannot. The sketch VALUES are
    * engine-specific (different sketch, different interpolation), so the
    * registered output is the BOUND AUDIT instead: per group, the exact
    * rank interval of each sketch answer — [count(<v), count(≤v)],
    * computed in-plan against the data itself — must overlap the target
    * rank ± the accuracy-10000 tolerance (rank error ≤ n/10000, +2 slack
    * for endpoint rounding; the LlmOpsSpec arithmetic promoted into the
    * query). The oracle pins the group set, n, and the expectation that
    * both bounds HOLD — a sketch regression breaks the hash. Conditions
    * are scaled ×10 so 0.5·n and 0.9·n stay in integers. */
  def q08dApproxPercentiles(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice*100,0) AS BIGINT)").as("c"))
    val ap = base.groupBy(col("l_returnflag")).agg(
      expr("approx_percentile(c, 0.5, 10000)").as("m_ap"),
      expr("approx_percentile(c, 0.9, 10000)").as("p_ap"))
    base.join(broadcast(ap), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c") < col("m_ap"), 1L).otherwise(0L)).as("lt_m"),
        sum(when(col("c") <= col("m_ap"), 1L).otherwise(0L)).as("le_m"),
        sum(when(col("c") < col("p_ap"), 1L).otherwise(0L)).as("lt_p"),
        sum(when(col("c") <= col("p_ap"), 1L).otherwise(0L)).as("le_p"))
      .withColumn("tol", col("n") / 10000 + 2)
      .select(col("l_returnflag"), col("n"),
        (col("lt_m") * 10 <= col("n") * 5 + col("tol") * 10 &&
          col("le_m") * 10 >= col("n") * 5 - col("tol") * 10)
          .as("median_in_bound"),
        (col("lt_p") * 10 <= col("n") * 9 + col("tol") * 10 &&
          col("le_p") * 10 >= col("n") * 9 - col("tol") * 10)
          .as("p90_in_bound"))
      .orderBy(col("l_returnflag"))
  }

  /** X139 — the PORTABLE bounded-memory quantile sketch next to q08d's
    * GK form: HDR-style log-bucketed histogram (16 sub-buckets per
    * octave ⇒ ≤ 1/16 relative error) over price cents, reporting
    * p50/p90/p99 as exact bucket [lo, hi] value ranges. Every step is
    * integer arithmetic the oracle replays — the sketch itself is
    * hash-checked across engines, and the histogram is a trivially
    * mergeable counts relation (sum buckets across shards/days), which
    * GK merging is not. Fixture binding of
    * [[graft.api.TrainingData.logHistQuantiles]]. */
  def x139LogHistQuantiles(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.logHistQuantiles(
      t(s, d, "lineitem")
        .select(expr("CAST(round(l_extendedprice*100,0) AS BIGINT)")
          .as("cents")),
      "cents", k = 16, quantiles = Seq(0.5, 0.9, 0.99))

  /** X139b — the MERGE law hash-checked: lineitem split into two
    * disjoint shards by orderkey parity, a histogram built PER SHARD,
    * the two histograms merged (union + groupBy(bucket).sum — the
    * operation a per-day/per-shard rollup performs), and the quantiles
    * read off the merged histogram. Held to the SAME oracle as x139's
    * direct whole-corpus form — result invariance under merging IS the
    * check (the x33b pattern), which is the property GK sketches do not
    * give you. */
  def x139bLogHistMerged(s: SparkSession, d: String): DataFrame = {
    val cents = t(s, d, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice*100,0) AS BIGINT)").as("cents"))
    def shard(pred: org.apache.spark.sql.Column) =
      graft.api.TrainingData.logHistogram(
        cents.filter(pred).select(col("cents")), "cents", k = 16)
    val merged = shard(col("l_orderkey") % 2 === 0)
      .unionByName(shard(col("l_orderkey") % 2 =!= 0))
      .groupBy(col("bucket")).agg(sum(col("c")).as("c"))
    graft.api.TrainingData.logHistQuantilesFromHistogram(
      merged, k = 16, quantiles = Seq(0.5, 0.9, 0.99))
  }

  /** X139c — the ZERO-INFLATED case of the log-histogram sketch: TPC-H
    * discount cents are 0..10 with a fat atom at 0 — exactly the shape
    * a "values < 1 are excluded" histogram silently mis-prices (n would
    * count only surviving rows and every low quantile would shift up a
    * bucket). Zeros land in the dedicated bucket −1 with value range
    * [0, 0], so n conserves the INPUT row count (hash-checked here: the
    * oracle's n is count(*) of non-null discounts) and p25 correctly
    * reads 0. Negative values raise a named in-plan error rather than
    * vanishing (FunctionsSpec). */
  def x139cLogHistZeros(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.logHistQuantiles(
      t(s, d, "lineitem")
        .select(expr("CAST(round(l_discount*100,0) AS BIGINT)")
          .as("disc_cents")),
      "disc_cents", k = 16, quantiles = Seq(0.25, 0.5, 0.9))

  /** X8 — correlation from exact integer accumulators: Spark's streaming
    * corr() is float-order-dependent, so the five sums are taken as exact
    * longs (at 100 TB: decimal(38) sums, same algebra) and the closed-form
    * correlation is evaluated once on identical operands in both engines. */
  def q08cCorrExact(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity").cast("long") // integral by construction
    val y = round(col("l_extendedprice") / 1000.0, 0).cast("long") // kilodollars
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"),
        // zero-variance guard: a constant series (single-row group, or
        // all-equal x or y) has correlation NULL like corr() — unguarded,
        // the 0/0 throws DIVIDE_BY_ZERO under ANSI and the engines would
        // disagree (Spark error vs DuckDB NaN)
        when(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n") * col("syy") - col("sy") * col("sy") > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6))
          .as("corr_qty_price"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** X15 — set operations with DISTINCT semantics: symmetric difference of
    * urgent-order customers vs big-order customers. */
  def q15SetOps(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val a = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val b = o.filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
    a.union(b).distinct().except(a.intersect(b)).orderBy(col("o_custkey"))
  }

  /** X15 — multiset (ALL) set operations: intersectAll keeps min
    * multiplicity, exceptAll subtracts multiplicity. */
  def q15bSetOpsAll(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val x = li.filter(col("l_quantity") < 5).select(col("l_suppkey"))
    val y = li.filter(col("l_discount") > 0.05).select(col("l_suppkey"))
    val inter = x.intersectAll(y).groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_inter"))
    val exc = x.exceptAll(y).groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_except"))
    inter.join(exc, Seq("l_suppkey"), "full_outer")
      .select(col("l_suppkey"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        coalesce(col("n_except"), lit(0L)).as("n_except"))
      .orderBy(col("l_suppkey"))
  }

  /** X16 — string functions over part. */
  def q16String(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .filter(col("p_name").like("%a%"))
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_type"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowelled"),
        trim(lit("  pad  ")).as("trimmed"),
        size(split(col("p_type"), " ")).as("n_type_words"))
      .orderBy(col("p_partkey"))

  /** X17 — date/time functions over orders. Spark dayofweek is 1=Sunday;
    * the oracle maps DuckDB's 0=Sunday accordingly. */
  def q17Date(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        quarter(col("o_orderdate")).as("qtr"),
        unix_millis(date_trunc("month", col("o_orderdate"))).as("month_start_ms"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"))
      .orderBy(col("o_orderkey"))

  /** X18 — math functions. libm-sensitive fns (ln) rounded to 6 decimals;
    * sqrt is IEEE correctly-rounded, pow on small ints exact. */
  def q18Math(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(100)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") / 1000.0, 1).as("price_k"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_quantity") - 25.0).as("qty_dev"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** X19 — array functions over the embedding vector column. */
  def q19Array(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 5).as("e1"),
        round(element_at(col("embedding"), 64).cast("double"), 5).as("e64"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("sum_e"),
        round(array_max(col("embedding")).cast("double"), 5).as("max_e"),
        round(array_min(col("embedding")).cast("double"), 5).as("min_e"),
        size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"))
      .orderBy(col("vec_id"))

  /** X20 — JSON functions over events.props (schema-on-read projection,
    * the generalization of the reference's one-attribute extraction,
    * JsonEvent.java:90). */
  def q20Json(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_get"),
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))("k").as("k_map"),
        json_tuple(col("props"), "k").as("k_tuple_str"))
      .withColumn("k_tuple", col("k_tuple_str").cast("long"))
      .drop("k_tuple_str")
      .orderBy(col("event_id"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q03b_large_join" -> (q03bLargeJoin _),
    "q08_distinct_agg" -> (q08Distinct _),
    "q08b_percentiles" -> (q08bPercentiles _),
    "q08d_approx_percentiles" -> (q08dApproxPercentiles _),
    "x139_loghist_quantiles" -> (x139LogHistQuantiles _),
    "x139b_loghist_merged" -> (x139bLogHistMerged _),
    "x139c_loghist_zeros" -> (x139cLogHistZeros _),
    "q08c_corr_exact" -> (q08cCorrExact _),
    "q09_approx_distinct" -> (q09Approx _),
    "q15_setops" -> (q15SetOps _),
    "q15b_setops_all" -> (q15bSetOpsAll _),
    "q16_string_fns" -> (q16String _),
    "q17_date_fns" -> (q17Date _),
    "q18_math_fns" -> (q18Math _),
    "q19_array_fns" -> (q19Array _),
    "q20_json_fns" -> (q20Json _))

  // log-histogram replay: identical integer bucket arithmetic
  // (length(bin(v))-1 octaves, 16 sub-buckets, shift/div inversion),
  // cumulative bucket pass, rank selection at ceil(q*n). SHARED by
  // x139 (direct) and x139b (per-shard merge) — result invariance
  // under merging is the x139b check
  private val logHistOracle =
    """WITH vals AS (
      |  SELECT CAST(round(l_extendedprice*100,0) AS BIGINT) AS v
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |pos AS (SELECT v FROM vals WHERE v >= 1),
      |bk AS (
      |  SELECT (length(bin(v)) - 1) * 16 +
      |    ((v - (CAST(1 AS BIGINT) << (length(bin(v)) - 1))) * 16)
      |      // (CAST(1 AS BIGINT) << (length(bin(v)) - 1)) AS bucket
      |  FROM pos),
      |h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM bk
      |      GROUP BY 1),
      |cum AS (SELECT bucket, c,
      |    CAST(sum(c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cum
      |  FROM h),
      |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
      |q(q_micros) AS (VALUES (CAST(500000 AS BIGINT)),
      |  (CAST(900000 AS BIGINT)), (CAST(990000 AS BIGINT))),
      |sel AS (
      |  SELECT q.q_micros, nn.n, min(cum.bucket) AS bucket
      |  FROM q, nn, cum
      |  WHERE cum.cum * 1000000 >= q.q_micros * nn.n
      |  GROUP BY 1, 2)
      |SELECT q_micros, n, bucket,
      |  (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT)) +
      |    ((bucket % 16) * (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT))
      |      + 15) // 16 AS value_lo,
      |  (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT)) +
      |    (((bucket % 16) + 1) *
      |      (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT)) + 15) // 16
      |    - 1 AS value_hi
      |FROM sel ORDER BY q_micros""".stripMargin

  // the zero-inflated replay: same bucket arithmetic plus the dedicated
  // zero bucket -1 ([0,0]); n = count(*) of non-null discounts, so the
  // hash check IS the count-conservation check
  private val logHistZerosOracle =
    """WITH vals AS (
      |  SELECT CAST(round(l_discount*100,0) AS BIGINT) AS v
      |  FROM lineitem WHERE l_discount IS NOT NULL),
      |bk AS (
      |  SELECT CASE WHEN v = 0 THEN CAST(-1 AS BIGINT)
      |    ELSE (length(bin(v)) - 1) * 16 +
      |      ((v - (CAST(1 AS BIGINT) << (length(bin(v)) - 1))) * 16)
      |        // (CAST(1 AS BIGINT) << (length(bin(v)) - 1)) END AS bucket
      |  FROM vals),
      |h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM bk
      |      GROUP BY 1),
      |cum AS (SELECT bucket, c,
      |    CAST(sum(c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cum
      |  FROM h),
      |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
      |q(q_micros) AS (VALUES (CAST(250000 AS BIGINT)),
      |  (CAST(500000 AS BIGINT)), (CAST(900000 AS BIGINT))),
      |sel AS (
      |  SELECT q.q_micros, nn.n, min(cum.bucket) AS bucket
      |  FROM q, nn, cum
      |  WHERE cum.cum * 1000000 >= q.q_micros * nn.n
      |  GROUP BY 1, 2)
      |SELECT q_micros, n, bucket,
      |  CASE WHEN bucket < 0 THEN CAST(0 AS BIGINT) ELSE
      |    (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT)) +
      |      ((bucket % 16) * (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT))
      |        + 15) // 16 END AS value_lo,
      |  CASE WHEN bucket < 0 THEN CAST(0 AS BIGINT) ELSE
      |    (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT)) +
      |      (((bucket % 16) + 1) *
      |        (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT)) + 15) // 16
      |      - 1 END AS value_hi
      |FROM sel ORDER BY q_micros""".stripMargin

  val oracles: Map[String, String] = Map(
    "x139b_loghist_merged" -> logHistOracle,
    "x139c_loghist_zeros" -> logHistZerosOracle,
    "q03b_large_join" ->
      """SELECT o_orderpriority,
        | sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q08b_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.5)/100.0, 4) AS median_price,
        | round(quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.9)/100.0, 4) AS p90_price,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "x139_loghist_quantiles" -> logHistOracle,
    // GK bound audit: the oracle pins the group set, n, and the
    // EXPECTATION that both sketch answers sit inside the accuracy-10000
    // rank band — the booleans are computed Spark-side against exact
    // in-plan rank counts, so a sketch regression flips them and breaks
    // the hash (ORACLES.md §8: the sketch VALUES stay engine-specific)
    "q08d_approx_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
        | TRUE AS median_in_bound, TRUE AS p90_in_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q08c_corr_exact" ->
      """WITH s AS (
        | SELECT l_returnflag, count(*) AS n,
        |  sum(CAST(l_quantity AS BIGINT)) AS sx,
        |  sum(CAST(round(l_extendedprice/1000.0, 0) AS BIGINT)) AS sy,
        |  sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice/1000.0, 0) AS BIGINT)) AS sxy,
        |  sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
        |  sum(CAST(round(l_extendedprice/1000.0, 0) AS BIGINT) * CAST(round(l_extendedprice/1000.0, 0) AS BIGINT)) AS syy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        | CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
        |   round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |     (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
        | END AS corr_qty_price,
        | n
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q08_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | sum(DISTINCT l_quantity) AS sum_dist_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q15_setops" ->
      """SELECT o_custkey FROM (
        | (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        | EXCEPT
        | (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        |) ORDER BY o_custkey""".stripMargin,
    "q15b_setops_all" ->
      """WITH x AS (SELECT l_suppkey FROM lineitem WHERE l_quantity < 5),
        | y AS (SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05),
        | i AS (SELECT l_suppkey, count(*) AS n_inter FROM (
        |   SELECT * FROM x INTERSECT ALL SELECT * FROM y) GROUP BY 1),
        | e AS (SELECT l_suppkey, count(*) AS n_except FROM (
        |   SELECT * FROM x EXCEPT ALL SELECT * FROM y) GROUP BY 1)
        |SELECT coalesce(i.l_suppkey, e.l_suppkey) AS l_suppkey,
        | coalesce(n_inter, 0) AS n_inter, coalesce(n_except, 0) AS n_except
        |FROM i FULL OUTER JOIN e ON i.l_suppkey = e.l_suppkey
        |ORDER BY l_suppkey""".stripMargin,
    "q16_string_fns" ->
      """SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand,
        | substring(p_name, 1, 5) AS prefix5,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowelled,
        | trim('  pad  ') AS trimmed,
        | CAST(length(string_split(p_type, ' ')) AS INTEGER) AS n_type_words
        |FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""".stripMargin,
    "q17_date_fns" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        | CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        | epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
        | CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
        | CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q18_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice/1000.0, 1) AS price_k,
        | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        | abs(l_quantity - 25.0) AS qty_dev,
        | pow(l_quantity, 2) AS qty_sq,
        | round(sqrt(l_extendedprice), 6) AS price_sqrt,
        | round(ln(l_extendedprice), 6) AS price_ln
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q19_array_fns" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS INTEGER) AS dim,
        | round(CAST(embedding[1] AS DOUBLE), 5) AS e1,
        | round(CAST(embedding[64] AS DOUBLE), 5) AS e64,
        | round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_e,
        | round(CAST(list_max(embedding) AS DOUBLE), 5) AS max_e,
        | round(CAST(list_min(embedding) AS DOUBLE), 5) AS min_e,
        | CAST(len(list_filter(embedding, x -> x > 0.0)) AS INTEGER) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q20_json_fns" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_get,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_map,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_tuple
        |FROM events ORDER BY event_id""".stripMargin)
}
