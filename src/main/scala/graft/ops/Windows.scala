package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Window functions, grouping sets, time windows, sessionization,
  * deterministic dedup, and the as-of join (SURVEY.md §2B X7, X11–X13,
  * X21–X23).
  *
  * Scale notes: every window here is partitioned by a high-cardinality key
  * (user_id, mktsegment×custkey) — no single-partition global windows in
  * the scalable path; time-window aggregations are hash aggregations on a
  * derived bucket column, which Catalyst plans partial→final. */
object Windows {

  /** X11 — rollup with grouping_id; NULL group keys made explicit. */
  def q11Rollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("gid"), col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("rf"), col("ls"))

  /** X11 — cube over two dimensions. */
  def q11bCube(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("revenue"),
        count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("revenue"), col("n"))
      .orderBy(col("gid"), col("status"), col("priority"))

  /** X11 — explicit GROUPING SETS via the SQL surface. The temp view gets
    * a per-call unique name and is dropped once the query is analyzed —
    * a fixed session-global name would let concurrent invocations over
    * DIFFERENT dirs rebind each other's data mid-analysis. */
  def q11cGroupingSets(s: SparkSession, d: String): DataFrame = {
    val view = s"li_gs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(s, d, "lineitem").createOrReplaceTempView(view)
    try s.sql( // sql() analyzes eagerly: the plan holds the resolved scan
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
         |       coalesce(l_linestatus, 'ALL') AS ls,
         |       sum(l_quantity) AS sum_qty, count(*) AS n
         |FROM $view
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY rf, ls""".stripMargin)
    finally s.catalog.dropTempView(view)
  }

  /** X12 — ranking window functions per market segment. Order within the
    * partition is total (acctbal desc, custkey) for determinism. */
  def q12Rank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, d, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      // relative-position pair completes the ranking family; both are one
      // integer division of partition-level counts, identical across
      // engines (round-6 is belt-and-braces house style)
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .filter(col("rn") <= 20)
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** X13 — analytic window functions (lag/lead/first/last) + rows frame
    * running sum (exact cents) + range frame (trailing 1 h count). */
  def q13Analytic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val wRange = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), tsMs(col("ts")).as("ts_ms"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("first_value_u", first(col("value")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("run_sum", sum(cents(col("value"))).over(
        w.rowsBetween(Window.unboundedPreceding, 0)) / 100.0)
      .withColumn("n_last_hour", count(lit(1)).over(wRange))
      .select(col("user_id"), col("event_id"), col("prev_value"),
        col("next_value"), col("first_value_u"), col("run_sum"), col("n_last_hour"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** X21 — event-time tumbling window (15 min) via the native `window`
    * function; epoch-aligned buckets, portable to the oracle's arithmetic. */
  def q21Tumbling(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start_ms"), col("event_type"))

  /** X21 — sliding window (30 min length, 15 min slide): each event lands
    * in exactly two windows. */
  def q21bSliding(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(window(col("ts"), "30 minutes", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("window_start_ms"), col("n"))
      .orderBy(col("window_start_ms"))

  /** X22 — session windows (30 min inactivity gap) as gaps-and-islands:
    * the batch-deterministic twin of `session_window` (whose streaming form
    * lives in graft.streaming). */
  def q22Session(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), tsMs(col("ts")).as("ts_ms"))
      .withColumn("new_session",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > 1800000L, 1)
          .otherwise(when(lag(col("ts_ms"), 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** X23 — deterministic dedup: earliest event per (user_id, event_type).
    * `dropDuplicates` keeps an arbitrary row; the row_number form pins the
    * survivor, which the hash-compare gate requires. */
  def q23Dedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ms"), col("event_id"))
    t(s, d, "events")
      .select(col("user_id"), col("event_type"), col("event_id"), tsMs(col("ts")).as("ts_ms"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_ms"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** X7 — as-of join: for each purchase, the latest signup of the same user
    * at or before it. Rides the generalized
    * [[graft.api.TrainingData.asOfJoin]] (union + last(ignoreNulls) over
    * an event-time order — one shuffle on user_id, no range explosion;
    * scales as a single sort-based window regardless of key skew on
    * time); this binding keeps the original q24 output shape while x138
    * carries the gap-returning attribution form. */
  def q24AsOf(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsMs(col("ts")).as("ts_ms"))
    graft.api.TrainingData.asOfJoin(
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms")),
      ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts_ms"), col("event_id")),
      "user_id", "ts_ms", "event_id")
      .select(col("event_id"), col("user_id"),
        col("matched_id").as("asof_signup_id"))
      .orderBy(col("event_id"))
  }

  /** Ordered funnel analysis over an event stream → per user: how far
    * through `steps` they progressed, with the time each step was first
    * reached. Step i counts only strictly AFTER the user reached step
    * i−1 (the ordered-funnel semantics: a click before any view does not
    * advance the funnel).
    *
    * One shuffle on the user: a single hash aggregation collects each
    * step's sorted event-time list per user (buffer bounded by the user's
    * own event count — the same bound sessionization already accepts),
    * then the fold t_i = min{t ∈ list_i : t > t_{i−1}} is row-local
    * column algebra. Each t_i is bound as a real column before the next
    * step's lambda references it, so the filter compares against an
    * attribute, not a re-evaluated subtree (lambda bodies sit outside
    * common-subexpression elimination). NULL propagates: once a step is
    * unreached every later step is NULL, and `reached` counts the prefix. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val lists = steps.zipWithIndex.map { case (s, i) =>
      sort_array(collect_list(when(col(typeCol) === s, col(tsCol)))).as(s"__l$i")
    }
    val agged = events.groupBy(col(userCol)).agg(lists.head, lists.tail: _*)
    var cur = agged.withColumn("__t0", array_min(col("__l0")))
    steps.indices.drop(1).foreach { i =>
      cur = cur.withColumn(s"__t$i",
        array_min(filter(col(s"__l$i"), e => e > col(s"__t${i - 1}"))))
    }
    val reached = steps.indices
      .map(i => when(col(s"__t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    cur.select(col(userCol) +: reached.as("reached") +:
      steps.indices.map(i => tsMs(col(s"__t$i")).as(s"t${i + 1}_ms")): _*)
  }

  /** Cohort retention over an event stream → (cohort_ms, offset, n_users):
    * users are cohorted by the period of their FIRST `cohortType` event
    * (period = `periodMs` buckets of event time), and for each later
    * period the count of distinct cohort members active (any event type)
    * is reported as the offset from their cohort period. Users who never
    * emit the cohort event are excluded; activity before the cohort event
    * is excluded (offset ≥ 0).
    *
    * Scale shape: min-aggregation per user for the cohort, distinct
    * (user, period) pairs for activity (both partial-aggregating), one
    * equi-join on the user (AQE broadcasts the cohort side when small),
    * and a final count-distinct per (cohort, offset) cell — every shuffle
    * is on a high-cardinality key. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, cohortType: String, periodMs: Long): DataFrame = {
    require(periodMs > 0, s"periodMs must be positive, got $periodMs")
    // floor(), not cast("long"): cast truncates toward zero, which
    // diverges from the oracle's // floor-division for pre-1970
    // timestamps (the double division itself is exact here — operands are
    // integers well under 2^53)
    val period = floor(tsMs(col(tsCol)) / periodMs).cast("long") * periodMs
    val cohort = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(min(period).as("__cohort_ms"))
    val activity = events
      .select(col(userCol), period.as("__act_ms")).distinct()
    activity.join(cohort, Seq(userCol))
      .filter(col("__act_ms") >= col("__cohort_ms"))
      .groupBy(col("__cohort_ms").as("cohort_ms"),
        floor((col("__act_ms") - col("__cohort_ms")) / periodMs)
          .cast("long").as("offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** X38 — daily signup-cohort retention over the events stream. */
  def q28Retention(s: SparkSession, d: String): DataFrame =
    retention(t(s, d, "events"), "user_id", "ts", "event_type",
      "signup", 86400000L)
      .orderBy(col("cohort_ms"), col("offset"))

  /** X37 — three-step ordered funnel (view → click → purchase) over the
    * events stream. */
  def q27Funnel(s: SparkSession, d: String): DataFrame =
    funnel(t(s, d, "events"), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  /** X54 — SFT turn assembly + loss-mask offsets over the events stream:
    * each user's event sequence treated as a conversation (turn text =
    * event_type + props, unique order = (ts, event_id)); purchase and
    * signup turns train, the rest are context. Fixture binding of
    * [[graft.api.TrainingData.turnLossMasks]]. */
  def x54TurnMasks(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.turnLossMasks(
      t(s, d, "events").select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("role"),
        concat_ws(" ", col("event_type"), col("props")).as("text")),
      "user_id", Seq("ts", "event_id"), "role", "text",
      Seq("purchase", "signup"))
      .orderBy(col("conv_id"), col("turn_idx"))

  /** X56 — RLHF preference-pair assembly over the events fixture: each
    * user's rated events stand in for a prompt's rated responses
    * (user → prompt, event → response, value → reward-model rating);
    * the top-rated event is chosen, every strictly-lower-rated one
    * pairs against it with the rating gap as margin. Fixture binding of
    * [[graft.api.TrainingData.preferencePairs]]. */
  def x56PreferencePairs(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.preferencePairs(
      t(s, d, "events").select(col("user_id"), col("event_id"), col("value")),
      "user_id", "event_id", "value")
      .orderBy(col("prompt_id"), col("rejected_id"))

  /** X74 — majority-vote label consolidation over the events fixture:
    * the props key stands in for an annotated ITEM, the event type for
    * an annotator's LABEL vote (item → example, event_type → label,
    * rows → votes); per item the most-voted label wins with
    * deterministic tie-break and `agreement` as the per-item
    * confidence. Fixture binding of
    * [[graft.api.TrainingData.majorityVote]]. */
  def x74MajorityVote(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.majorityVote(
      t(s, d, "events").select(
        get_json_object(col("props"), "$.k").cast("long").as("item_id"),
        col("event_type")),
      "item_id", "event_type")
      .orderBy(col("item"))

  /** X88 — per-event-type rolling ingestion anomaly: hourly counts
    * scored against the trailing 24 observed hours. Fixture binding of
    * [[graft.api.TrainingData.rollingAnomaly]]. */
  def x88EventAnomaly(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.rollingAnomaly(
      t(s, d, "events"), "event_type", "ts")
      .orderBy(col("series"), col("bucket"))

  /** X89 — event-type transition matrix (first-order Markov estimate):
    * per-user consecutive pairs with exact integer-micro conditional
    * probabilities. Fixture binding of
    * [[graft.api.TrainingData.transitionMatrix]]. */
  def x89EventTransitions(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.transitionMatrix(
      t(s, d, "events"), "user_id", "event_type", "ts", "event_id")
      .orderBy(col("from_type"), col("to_type"))

  /** X94 — SCD2 state intervals over the event log: per-user runs of
    * the same event type collapse into [valid_from, valid_to) validity
    * intervals, NULL valid_to on the open one — the gaps-and-islands
    * dimension build. Fixture binding of
    * [[graft.api.TrainingData.stateIntervals]]. */
  def x94StateIntervals(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.stateIntervals(
      t(s, d, "events"), "user_id", "event_type", "ts", "event_id")
      .withColumnRenamed("k", "user_id")
      .withColumnRenamed("state", "event_type")
      .orderBy(col("user_id"), col("valid_from"))

  /** X99 — Fleiss' kappa over the events-as-annotations reading (the
    * x74 mapping: props.k = item, user_id = rater, event_type = label),
    * one rating per (item, rater) — the latest by (ts, event_id).
    * κ near 0 says the raters are noise and x74's majority labels would
    * consolidate that noise with full confidence. Fixture binding of
    * [[graft.api.TrainingData.fleissKappa]]. */
  def x99FleissKappa(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item_id"), col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val ratings = t(s, d, "events")
      .select(
        get_json_object(col("props"), "$.k").cast("long").as("item_id"),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .filter(col("item_id").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("ts").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    graft.api.TrainingData
      .fleissKappa(ratings, "item_id", "user_id", "event_type")
  }

  /** X131 — autocorrelation of the daily event count at lags 1 and 7:
    * r(7) ≫ r(1) is the weekly-seasonality signature, a collapse of
    * both flags an ingestion regime change. Fixture binding of
    * [[graft.api.TrainingData.dailyAutocorr]]. */
  def x131DailyAutocorr(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.dailyAutocorr(
      t(s, d, "events"), "ts", Seq(1, 7))
      .orderBy(col("lag"))

  /** X132 — CUSUM changepoint scan of the daily event count: the exact
    * cumulative-deviation sequence plus the argmax level-shift day
    * broadcast — locates the persistent regime change x88's per-bucket
    * z-scores absorb. Fixture binding of
    * [[graft.api.TrainingData.cusumChangepoint]]. */
  def x132Cusum(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.cusumChangepoint(t(s, d, "events"), "ts")
      .orderBy(col("day"))

  /** X138 — last-touch attribution via the generalized
    * [[graft.api.TrainingData.asOfJoin]]: each purchase matched to the
    * user's latest click at-or-before it, WITH the attribution gap —
    * the q24 recipe promoted to a reusable API that carries the full
    * left row and the time-to-convert (the column a marketing/causal
    * pipeline actually consumes; q24 returns only the matched id).
    * Same scale shape: one shuffle on the key, one sort, a
    * carry-forward window — no range-join explosion. */
  def x138AsofAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsMs(col("ts")).as("ts_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms"), col("event_id"))
    graft.api.TrainingData.asOfJoin(
      purchases, clicks, "user_id", "ts_ms", "event_id")
      .select(col("purchase_id"), col("user_id"), col("ts_ms"),
        col("matched_id").as("click_id"), col("asof_gap_ms"))
      .orderBy(col("purchase_id"))
  }

  /** X138b — the SKEW-HARDENED as-of join under a deliberately hot key:
    * 90% of users collapse onto key 0 (the anonymous-traffic shape a
    * real click stream has), and
    * [[graft.api.TrainingData.asOfJoinSalted]] answers the same
    * last-touch question with the carry-forward window partitioned by
    * (key, hour-bucket) — the hot key's history spreads across buckets
    * instead of one straggler partition, and the cross-bucket carry-in
    * runs over the per-bucket summary (bucket COUNT rows per key, not
    * event count). Held to the plain as-of semantics via the oracle:
    * same match, same gap, on the skewed key. */
  def x138bAsofSalted(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_id"),
        when(col("user_id") % 10 < 9, lit(0L)).otherwise(col("user_id"))
          .as("grp_key"),
        col("event_type"), tsMs(col("ts")).as("ts_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("grp_key"),
        col("ts_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("grp_key"), col("ts_ms"), col("event_id"))
    graft.api.TrainingData.asOfJoinSalted(
      purchases, clicks, "grp_key", "ts_ms", "event_id",
      bucketMs = 3600000L)
      .select(col("purchase_id"), col("grp_key"), col("ts_ms"),
        col("matched_id").as("click_id"), col("asof_gap_ms"))
      .orderBy(col("purchase_id"))
  }

  /** X147 — Kaplan–Meier churn risk table with right-censoring over the
    * events stream: each user's lifespan in HOURS (first event → last
    * event), churn OBSERVED only when the user has been silent for the
    * final 12 hours of the observation window — users still active near
    * the end are CENSORED, not counted as churned (the estimator
    * q28-style retention can't express), cohorted by whether the user
    * ever signed up. Plus the Nelson–Aalen cumulative hazard and e^(−H)
    * survival. Fixture binding of
    * [[graft.api.TrainingData.kaplanMeier]]. */
  def x147KaplanMeier(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), tsMs(col("ts")).as("ms"), col("event_type"))
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
        max(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("signed"))
    val horizon = ev.agg(max(col("ms")).as("max_ms"))
    val cohorts = perUser.crossJoin(broadcast(horizon))
      .select(
        when(col("signed") === 1, lit("signup")).otherwise(lit("organic"))
          .as("cohort"),
        expr("(last_ms - first_ms) div 3600000").as("dur_hours"),
        when(col("last_ms") < col("max_ms") - 43200000L, 1L).otherwise(0L)
          .as("churned"))
    graft.api.TrainingData.kaplanMeier(cohorts, "cohort", "dur_hours",
      "churned")
  }

  /** X148 — frequent event-type pairs per user basket: which behaviors
    * co-occur in the same user's history, with support, both
    * confidences, and lift — the Apriori level-2 market-basket read of
    * the events stream ("users who purchase also signup" with the
    * probability units x89's transition matrix and x79's PMI don't
    * give). Fixture binding of
    * [[graft.api.TrainingData.frequentItemPairs]]. */
  def x148FreqPairs(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.frequentItemPairs(
      t(s, d, "events")
        .filter(col("user_id").isNotNull && col("event_type").isNotNull),
      "user_id", "event_type", minSupport = 20L)

  /** X160 — Theil–Sen robust trend of the daily event count: the median
    * of all day-pair slopes (micro-events/day), immune to the ingestion
    * bursts that drag a least-squares fit — the robust companion to
    * x131's autocorrelation and x132's CUSUM over the same series.
    * Fixture binding of [[graft.api.TrainingData.theilSenSlope]]. */
  def x160TheilSen(s: SparkSession, d: String): DataFrame =
    graft.api.TrainingData.theilSenSlope(
      t(s, d, "events")
        .filter(col("ts").isNotNull)
        // fixture timestamps are all post-1970 (nonnegative millis), so
        // truncating div == floor here
        .select(expr("unix_millis(CAST(ts AS TIMESTAMP)) div 86400000L")
          .as("day"), lit(1L).as("one")),
      "day", "one")

  /** X163 — log-rank test between the even- and odd-user-id cohorts'
    * churn curves, over the same lifespan/censoring framing as x147:
    * whether the two Kaplan–Meier curves differ beyond chance. Fixture
    * binding of [[graft.api.TrainingData.logRankTest]]. */
  def x163LogRank(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), tsMs(col("ts")).as("ms"))
    // user-grain relation feeds the horizon AND the cohort projection —
    // eager checkpoint scans events once; the global max over users'
    // last events IS the global max event time, so no second scan
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"))
      .localCheckpoint(true)
    val horizon = perUser.agg(max(col("last_ms")).as("max_ms"))
    val cohorts = perUser.crossJoin(broadcast(horizon))
      .select((col("user_id") % 2 === 0).as("is_even"),
        expr("(last_ms - first_ms) div 3600000").as("dur_hours"),
        when(col("last_ms") < col("max_ms") - 43200000L, 1L).otherwise(0L)
          .as("churned"))
    graft.api.TrainingData.logRankTest(cohorts, "is_even", "dur_hours",
      "churned")
  }

  /** X167 — Krippendorff's α (nominal) over the same deduped
    * (item, rater, label) relation as x99's Fleiss κ: the
    * missing-data-correct agreement coefficient (per-item pairable
    * weighting), so the two can be read side by side on one corpus.
    * Fixture binding of [[graft.api.TrainingData.krippendorffAlpha]]. */
  def x167Krippendorff(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item_id"), col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val ratings = t(s, d, "events")
      .select(
        get_json_object(col("props"), "$.k").cast("long").as("item_id"),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .filter(col("item_id").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("ts").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    graft.api.TrainingData
      .krippendorffAlpha(ratings, "item_id", "event_type")
  }

  /** X178 — CUPED variance-reduced per-arm activity means over the
    * events stream: arms by user-id parity, pre-period x = each user's
    * first-half event count, post-period y = second-half count — the
    * experimentation adjustment that cancels per-user baseline
    * activity out of the arm comparison. Fixture binding of
    * [[graft.api.TrainingData.cuped]]. */
  def x178Cuped(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), tsMs(col("ts")).as("ms"))
    val bounds = ev.agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
    val perUser = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ms") <= expr("lo + (hi - lo) div 2"), 1L)
          .otherwise(0L)).as("x_pre"),
        sum(when(col("ms") > expr("lo + (hi - lo) div 2"), 1L)
          .otherwise(0L)).as("y_post"))
      .select((col("user_id") % 2 === 0).as("arm_even"),
        col("x_pre"), col("y_post"))
    graft.api.TrainingData.cuped(perUser, "arm_even", "x_pre", "y_post")
  }

  /** X181 — Friedman test of the purchase/click/view volume ORDERING
    * across days: each day ranks its three event-type counts; a large
    * χ²_F says the ordering is systematic (views always dominate), a
    * small one says the type mix is interchangeable day to day — the
    * repeated-measures companion to x179 (independent groups) on the
    * stream side. Fixture binding of
    * [[graft.api.TrainingData.friedmanTest]]. */
  def x181Friedman(s: SparkSession, d: String): DataFrame = {
    val blk = t(s, d, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      // fixture timestamps are post-1970 — truncating div == floor
      .groupBy(expr("unix_millis(CAST(ts AS TIMESTAMP)) div 86400000L")
        .as("day"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchase"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_click"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("n_view"))
    graft.api.TrainingData.friedmanTest(blk,
      Seq("n_purchase", "n_click", "n_view"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x160_theil_sen" -> (x160TheilSen _),
    "x178_cuped" -> (x178Cuped _),
    "x181_friedman" -> (x181Friedman _),
    "x163_log_rank" -> (x163LogRank _),
    "x167_krippendorff" -> (x167Krippendorff _),
    "x138_asof_attribution" -> (x138AsofAttribution _),
    "x138b_asof_salted" -> (x138bAsofSalted _),
    "x147_kaplan_meier" -> (x147KaplanMeier _),
    "x148_freq_pairs" -> (x148FreqPairs _),
    "x131_daily_autocorr" -> (x131DailyAutocorr _),
    "x132_cusum_changepoint" -> (x132Cusum _),
    "x99_fleiss_kappa" -> (x99FleissKappa _),
    "x94_state_intervals" -> (x94StateIntervals _),
    "x88_event_anomaly" -> (x88EventAnomaly _),
    "x89_event_transitions" -> (x89EventTransitions _),
    "x74_label_votes" -> (x74MajorityVote _),
    "x54_turn_masks" -> (x54TurnMasks _),
    "x56_preference_pairs" -> (x56PreferencePairs _),
    "q27_funnel" -> (q27Funnel _),
    "q28_retention" -> (q28Retention _),
    "q11_rollup" -> (q11Rollup _),
    "q11b_cube" -> (q11bCube _),
    "q11c_grouping_sets" -> (q11cGroupingSets _),
    "q12_window_rank" -> (q12Rank _),
    "q13_window_analytic" -> (q13Analytic _),
    "q21_window_tumbling" -> (q21Tumbling _),
    "q21b_window_sliding" -> (q21bSliding _),
    "q22_sessionize" -> (q22Session _),
    "q23_dedup_keyed" -> (q23Dedup _),
    "q24_asof_join" -> (q24AsOf _))

  val oracles: Map[String, String] = Map(
    // Friedman replay: per-day type counts, row-local doubled midranks
    // and tie terms (k = 3 CASE sums), chained truncated statistic +
    // tie correction with the clamp
    "x181_friedman" ->
      """WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000
        |    AS day, event_type
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |blk AS (SELECT day,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS v0,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS v1,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
        |      END) AS BIGINT) AS v2
        |  FROM e GROUP BY 1),
        |rk AS (SELECT
        |    2 * ((CASE WHEN v1 < v0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 < v0 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v1 = v0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 = v0 THEN 1 ELSE 0 END) + 2 AS r0,
        |    2 * ((CASE WHEN v0 < v1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 < v1 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v0 = v1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 = v1 THEN 1 ELSE 0 END) + 2 AS r1,
        |    2 * ((CASE WHEN v0 < v2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v1 < v2 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v0 = v2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v1 = v2 THEN 1 ELSE 0 END) + 2 AS r2,
        |    (CASE WHEN v0 = v1 THEN 1 ELSE 0 END
        |      + CASE WHEN v0 = v2 THEN 1 ELSE 0 END
        |      + CASE WHEN v1 = v2 THEN 1 ELSE 0 END) AS eqp
        |  FROM blk),
        |rk2 AS (SELECT r0, r1, r2,
        |    CASE eqp WHEN 0 THEN 0 WHEN 1 THEN 6 ELSE 24 END AS tb
        |  FROM rk),
        |sm AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(tb) AS BIGINT) AS t,
        |    CAST(sum(r0) AS BIGINT) AS s0, CAST(sum(r1) AS BIGINT) AS s1,
        |    CAST(sum(r2) AS BIGINT) AS s2
        |  FROM rk2),
        |st AS (SELECT n, t,
        |    CAST((3000000 * (CAST(s0 AS HUGEINT) * s0
        |      + CAST(s1 AS HUGEINT) * s1 + CAST(s2 AS HUGEINT) * s2))
        |      // (CAST(n AS HUGEINT) * 3 * 4)
        |      - 3000000 * n * 4 AS BIGINT) AS chi2_micros
        |  FROM sm)
        |SELECT n AS n_blocks, CAST(3 AS BIGINT) AS k, t AS tie_sum,
        |  chi2_micros,
        |  CASE WHEN CAST(n AS HUGEINT) * 24 - t = 0 THEN NULL
        |    ELSE CAST((greatest(0, CAST(chi2_micros AS HUGEINT))
        |      * (CAST(n AS HUGEINT) * 24))
        |      // (CAST(n AS HUGEINT) * 24 - t) AS BIGINT)
        |  END AS chi2_tc_micros
        |FROM st""".stripMargin,
    // CUPED replay: global half-window split, per-user pre/post
    // counts, pooled sign-explicit θ, per-arm adjusted means with the
    // same sign-explicit correction truncation
    "x178_cuped" ->
      """WITH e AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |bd AS (SELECT min(ms) AS lo, max(ms) AS hi FROM e),
        |pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN ms <= lo + (hi - lo) // 2 THEN 1 ELSE 0
        |      END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ms > lo + (hi - lo) // 2 THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM e, bd GROUP BY 1),
        |arm AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'true'
        |    ELSE 'false' END AS arm, x, y FROM pu),
        |th AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx FROM arm),
        |th2 AS (SELECT (1000000 * sx) // n AS mean_x_micros,
        |    CASE WHEN CAST(n AS HUGEINT) * sxx
        |        - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
        |      ELSE CAST(sign(CAST(n AS HUGEINT) * sxy
        |          - CAST(sx AS HUGEINT) * sy) AS BIGINT)
        |        * CAST((1000000 * abs(CAST(n AS HUGEINT) * sxy
        |          - CAST(sx AS HUGEINT) * sy))
        |          // (CAST(n AS HUGEINT) * sxx
        |          - CAST(sx AS HUGEINT) * sx) AS BIGINT)
        |    END AS theta_micros FROM th),
        |pa AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_arm,
        |    CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya
        |  FROM arm GROUP BY 1)
        |SELECT arm, n_arm, (1000000 * sxa) // n_arm AS mean_x_arm_micros,
        |  (1000000 * sya) // n_arm AS mean_y_arm_micros, theta_micros,
        |  CASE WHEN theta_micros IS NULL THEN (1000000 * sya) // n_arm
        |    ELSE (1000000 * sya) // n_arm
        |      - CAST(sign(theta_micros * ((1000000 * sxa) // n_arm
        |          - mean_x_micros)) AS BIGINT)
        |        * (abs(theta_micros * ((1000000 * sxa) // n_arm
        |          - mean_x_micros)) // 1000000)
        |  END AS adj_mean_y_micros
        |FROM pa, th2 ORDER BY arm""".stripMargin,
    // Theil–Sen replay: day-grain points, all increasing-x pairs with
    // sign-explicit truncated micro slopes, quantile_cont median (the
    // x31d portable percentile pair) rounded once to 6
    "x160_theil_sen" ->
      """WITH pts AS (
        |  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |sl AS (
        |  SELECT CASE WHEN b.y >= a.y THEN 1 ELSE -1 END
        |    * ((1000000 * abs(b.y - a.y)) // (b.x - a.x)) AS s
        |  FROM pts a JOIN pts b ON b.x > a.x),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(quantile_cont(s, 0.5), 6) AS slope_median_micros FROM sl),
        |p AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
        |  min(x) AS x_min, max(x) AS x_max FROM pts)
        |SELECT n_points, n_pairs, x_min, x_max, slope_median_micros
        |FROM agg, p""".stripMargin,
    // log-rank replay: the x147 lifespan/censoring framing split by
    // user-id parity, at-risk via the total-minus-exited identity, E/V
    // truncated micros once per event time, HUGEINT square in the
    // final statistic
    "x163_log_rank" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |pu AS (SELECT user_id, min(ms) AS first_ms, max(ms) AS last_ms
        |  FROM e GROUP BY 1),
        |hz AS (SELECT max(ms) AS max_ms FROM e),
        |c AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
        |    (last_ms - first_ms) // 3600000 AS t,
        |    CASE WHEN last_ms < max_ms - 43200000 THEN 1 ELSE 0 END AS ev
        |  FROM pu, hz),
        |byt AS (
        |  SELECT t, CAST(sum(ia * ev) AS BIGINT) AS d_a,
        |    CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(ia) AS BIGINT) AS m_a,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM c GROUP BY 1),
        |rk AS (
        |  SELECT t, d_a, d, m_a, m,
        |    sum(m) OVER () - sum(m) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + m
        |      AS n_at,
        |    sum(m_a) OVER () - sum(m_a) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + m_a
        |      AS na_at
        |  FROM byt),
        |evt AS (SELECT * FROM rk WHERE d > 0),
        |agg AS (
        |  SELECT CAST(sum(d_a) AS BIGINT) AS o_a,
        |    CAST(sum(d) AS BIGINT) AS events_total,
        |    CAST(max(n_at) AS BIGINT) AS n,
        |    CAST(max(na_at) AS BIGINT) AS n_a,
        |    CAST(sum((1000000 * d * na_at) // n_at) AS BIGINT)
        |      AS e_a_micros,
        |    sum(CASE WHEN n_at <= 1 THEN CAST(0 AS HUGEINT)
        |      ELSE (1000000 * CAST(d AS HUGEINT) * na_at
        |        * (n_at - na_at) * (n_at - d))
        |        // (CAST(n_at AS HUGEINT) * n_at * (n_at - 1)) END)
        |      AS var_h
        |  FROM evt)
        |SELECT n, n_a, n - n_a AS n_b, events_total, o_a, e_a_micros,
        |  1000000 * o_a - e_a_micros AS oe_sum_micros,
        |  CAST(var_h AS BIGINT) AS var_sum_micros,
        |  CASE WHEN var_h = 0 THEN NULL
        |    ELSE CAST((CAST(1000000 * o_a - e_a_micros AS HUGEINT)
        |      * (1000000 * o_a - e_a_micros)) // var_h AS BIGINT)
        |  END AS chi2_micros
        |FROM agg""".stripMargin,
    // Krippendorff-α replay: the x99 dedup CTE, per-item disagreement
    // quantized once to micros over the pairable (n_i ≥ 2) items,
    // marginal chance in HUGEINT, sign-explicit final division
    "x167_krippendorff" ->
      """WITH r0 AS (
        |  SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
        |      AS item, user_id, event_type,
        |    row_number() OVER (
        |      PARTITION BY CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
        |        AS BIGINT), user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE props IS NOT NULL
        |    AND regexp_extract(props, '"k": ([0-9]+)', 1) <> ''
        |    AND user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |r AS (SELECT item, event_type AS label FROM r0 WHERE rn = 1),
        |cell AS (SELECT item, label, CAST(count(*) AS BIGINT) AS n_il
        |  FROM r GROUP BY 1, 2),
        |pi AS (SELECT item, CAST(sum(n_il) AS BIGINT) AS n_i,
        |    CAST(sum(n_il * n_il) AS BIGINT) AS sq_i
        |  FROM cell GROUP BY 1),
        |pi2 AS (SELECT item, n_i,
        |    (1000000 * (n_i * n_i - sq_i)) // (n_i - 1) AS do_i
        |  FROM pi WHERE n_i >= 2),
        |kept AS (SELECT c.label, c.n_il FROM cell c JOIN pi2 USING (item)),
        |mg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_labels,
        |    CAST(sum(n_c) AS BIGINT) AS n,
        |    sum(CAST(n_c AS HUGEINT) * n_c) AS sq_c
        |  FROM (SELECT label, CAST(sum(n_il) AS BIGINT) AS n_c
        |        FROM kept GROUP BY 1)),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(do_i) AS BIGINT) AS do_micros FROM pi2)
        |SELECT n_items, n AS n_pairable, n_labels, do_micros,
        |  CASE WHEN CAST(n AS HUGEINT) * n - sq_c = 0 THEN NULL
        |    ELSE 1000000 - (CASE WHEN do_micros >= 0 THEN 1 ELSE -1 END)
        |      * CAST((abs(CAST(do_micros AS HUGEINT)) * (n - 1))
        |        // (CAST(n AS HUGEINT) * n - sq_c) AS BIGINT)
        |  END AS alpha_micros
        |FROM ag, mg""".stripMargin,
    // Kaplan–Meier replay: per-user lifespan/censoring derivation, then
    // the (cohort, duration) risk table — cumulative exits over distinct
    // durations, truncated-micro hazard terms, one exp() per output row
    "x147_kaplan_meier" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |pu AS (
        |  SELECT user_id, min(ms) AS first_ms, max(ms) AS last_ms,
        |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signed
        |  FROM e GROUP BY 1),
        |hz AS (SELECT max(ms) AS max_ms FROM e),
        |c AS (
        |  SELECT CASE WHEN signed = 1 THEN 'signup' ELSE 'organic' END
        |      AS grp,
        |    (last_ms - first_ms) // 3600000 AS t,
        |    CASE WHEN last_ms < max_ms - 43200000 THEN 1 ELSE 0 END AS ev
        |  FROM pu, hz),
        |byt AS (
        |  SELECT grp, t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS cens,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM c GROUP BY 1, 2),
        |rk AS (
        |  SELECT grp, t, d, cens, m,
        |    sum(m) OVER (PARTITION BY grp) AS n_total,
        |    sum(m) OVER (PARTITION BY grp ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS exited_thru
        |  FROM byt),
        |hzd AS (
        |  SELECT grp, t, d, cens,
        |    CAST(n_total - exited_thru + m AS BIGINT) AS at_risk,
        |    (1000000 * d) // (n_total - exited_thru + m) AS haz
        |  FROM rk),
        |cum AS (
        |  SELECT grp, t, d, cens, at_risk,
        |    CAST(sum(haz) OVER (PARTITION BY grp ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS hazard_cum_micros
        |  FROM hzd)
        |SELECT grp, t, at_risk, d AS d_events, cens AS n_censored,
        |  hazard_cum_micros,
        |  CAST(round(exp(-CAST(hazard_cum_micros AS DOUBLE) / 1e6)
        |    * 1000000, 0) AS BIGINT) AS survival_micros
        |FROM cum WHERE d > 0 ORDER BY grp, t""".stripMargin,
    // Apriori level-2 replay: distinct (basket, item), frequent
    // singletons, within-basket pair join, chained truncated divisions
    // for confidence and lift in the same order
    "x148_freq_pairs" ->
      """WITH it AS (
        |  SELECT DISTINCT user_id AS b, CAST(event_type AS VARCHAR) AS i
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |l1 AS (SELECT i, CAST(count(*) AS BIGINT) AS s1 FROM it GROUP BY 1
        |       HAVING count(*) >= 20),
        |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets
        |       FROM it),
        |f AS (SELECT it.b, it.i, s1 FROM it JOIN l1 ON it.i = l1.i),
        |p AS (
        |  SELECT a.i AS i1, c.i AS i2, a.s1 AS sa, c.s1 AS sb,
        |    CAST(count(*) AS BIGINT) AS s_ab
        |  FROM f a JOIN f c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2, 3, 4
        |  HAVING count(*) >= 20)
        |SELECT i1, i2, s_ab, sa AS s_i1, sb AS s_i2, n_baskets,
        |  CAST((1000000 * s_ab) // sa AS BIGINT) AS conf_1to2_micros,
        |  CAST((1000000 * s_ab) // sb AS BIGINT) AS conf_2to1_micros,
        |  CAST((((1000000 * s_ab) // sa) * n_baskets) // sb AS BIGINT)
        |    AS lift_micros
        |FROM p, nb ORDER BY s_ab DESC, i1, i2""".stripMargin,
    // as-of replay without window IGNORE NULLS: matched ts = max prior
    // click ts per purchase, matched id = max click id at that ts (the
    // same (ts, id) tie-break the Spark sort order applies)
    "x138_asof_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
        |  FROM events
        |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND ts IS NOT NULL),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_ms FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts_ms FROM e
        |      WHERE event_type = 'click'),
        |mt AS (
        |  SELECT p.purchase_id, p.user_id, p.ts_ms, max(c.ts_ms) AS ct
        |  FROM p LEFT JOIN c
        |    ON c.user_id = p.user_id AND c.ts_ms <= p.ts_ms
        |  GROUP BY 1, 2, 3),
        |mi AS (
        |  SELECT mt.purchase_id, mt.user_id, mt.ts_ms, mt.ct,
        |    max(c2.event_id) AS click_id
        |  FROM mt LEFT JOIN c c2
        |    ON c2.user_id = mt.user_id AND c2.ts_ms = mt.ct
        |  GROUP BY 1, 2, 3, 4)
        |SELECT purchase_id, user_id, ts_ms, click_id,
        |  ts_ms - ct AS asof_gap_ms
        |FROM mi ORDER BY purchase_id""".stripMargin,
    // the salted two-phase form is held to the PLAIN as-of semantics on
    // the skewed key — bucketing must be invisible in the result
    "x138b_asof_salted" ->
      """WITH e AS (
        |  SELECT event_id,
        |    CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS grp_key,
        |    event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
        |  FROM events
        |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND ts IS NOT NULL),
        |p AS (SELECT event_id AS purchase_id, grp_key, ts_ms FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, grp_key, ts_ms FROM e
        |      WHERE event_type = 'click'),
        |mt AS (
        |  SELECT p.purchase_id, p.grp_key, p.ts_ms, max(c.ts_ms) AS ct
        |  FROM p LEFT JOIN c
        |    ON c.grp_key = p.grp_key AND c.ts_ms <= p.ts_ms
        |  GROUP BY 1, 2, 3),
        |mi AS (
        |  SELECT mt.purchase_id, mt.grp_key, mt.ts_ms, mt.ct,
        |    max(c2.event_id) AS click_id
        |  FROM mt LEFT JOIN c c2
        |    ON c2.grp_key = mt.grp_key AND c2.ts_ms = mt.ct
        |  GROUP BY 1, 2, 3, 4)
        |SELECT purchase_id, grp_key, ts_ms, click_id,
        |  ts_ms - ct AS asof_gap_ms
        |FROM mi ORDER BY purchase_id""".stripMargin,
    // kappa replay: latest rating per (item, rater), (item, label) cell
    // counts, per-item pairwise agreement quantized once to micros,
    // per-label micro shares over the SAME >= 2-rater population, the
    // sign-explicit integer kappa division (// ≡ div on nonnegatives)
    "x99_fleiss_kappa" ->
      """WITH r0 AS (
        |  SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
        |      AS item, user_id, event_type,
        |    row_number() OVER (
        |      PARTITION BY CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
        |        AS BIGINT), user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE props IS NOT NULL
        |    AND regexp_extract(props, '"k": ([0-9]+)', 1) <> ''
        |    AND user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |r AS (SELECT item, event_type AS label FROM r0 WHERE rn = 1),
        |cell AS (SELECT item, label, count(*) AS n_il FROM r GROUP BY 1, 2),
        |pi AS (SELECT item, CAST(sum(n_il) AS BIGINT) AS n_i,
        |    CAST(sum(n_il * (n_il - 1)) AS BIGINT) AS agree
        |  FROM cell GROUP BY 1),
        |pi2 AS (SELECT item, n_i,
        |    (agree * 1000000) // (n_i * (n_i - 1)) AS a_micro
        |  FROM pi WHERE n_i >= 2),
        |it AS (SELECT count(*) AS n_items,
        |    CAST(sum(n_i) AS BIGINT) AS n_ratings,
        |    CAST(sum(a_micro) AS BIGINT) AS a_sum FROM pi2),
        |kept AS (SELECT c.label, c.n_il FROM cell c JOIN pi2 USING (item)),
        |lt AS (SELECT label, CAST(sum(n_il) AS BIGINT) AS c_l
        |  FROM kept GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_il) AS BIGINT) AS tot FROM kept),
        |pm AS (SELECT (c_l * 1000000) // tot AS p_micro FROM lt, tt),
        |pe AS (SELECT count(*) AS n_labels,
        |    CAST(sum(p_micro * p_micro) // 1000000 AS BIGINT) AS pe_micro
        |  FROM pm),
        |s AS (SELECT n_items, n_ratings, n_labels,
        |    CAST(a_sum // n_items AS BIGINT) AS po_micro, pe_micro
        |  FROM it, pe)
        |SELECT n_items, n_ratings, n_labels, po_micro, pe_micro,
        |  CASE WHEN pe_micro >= 1000000 THEN NULL
        |    ELSE CAST(CASE WHEN po_micro >= pe_micro THEN 1 ELSE -1 END
        |      * ((abs(po_micro - pe_micro) * 1000000)
        |         // (1000000 - pe_micro)) AS BIGINT) END AS kappa_micro
        |FROM s""".stripMargin,
    // SCD2 replay: per-user lag over (t, event_id), change flag, ROWS
    // running sum -> run id, (user, run) interval aggregation, lead of
    // valid_from over the per-user interval relation
    "x94_state_intervals" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS t, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) AS prev
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |r AS (
        |  SELECT user_id, event_type, t,
        |    sum(CASE WHEN prev IS NULL OR prev <> event_type
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |        ROWS UNBOUNDED PRECEDING) AS run
        |  FROM seq),
        |iv AS (
        |  SELECT user_id, min(event_type) AS event_type, run,
        |    min(t) AS valid_from, count(*) AS n_events
        |  FROM r GROUP BY user_id, run)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
        |    AS valid_to,
        |  n_events
        |FROM iv ORDER BY user_id, valid_from""".stripMargin,
    // rolling anomaly: hourly (series, bucket) counts, trailing-24 ROWS
    // frame sums, z in one arithmetic sequence from the integer sums;
    // < 8 predecessors or zero variance -> NULL
    // autocorrelation replay: same epoch-ms day buckets, the lag self
    // join, HUGEINT Pearson sums, the identical IEEE r² expression
    "x131_daily_autocorr" ->
      """WITH daily AS (
        |  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day,
        |    count(*) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |pairs AS (
        |  SELECT 1 AS lag, CAST(a.y AS HUGEINT) AS x, CAST(b.y AS HUGEINT) AS z
        |  FROM daily a JOIN daily b ON b.day = a.day + 1
        |  UNION ALL
        |  SELECT 7, CAST(a.y AS HUGEINT), CAST(b.y AS HUGEINT)
        |  FROM daily a JOIN daily b ON b.day = a.day + 7),
        |a AS (
        |  SELECT lag, count(*) AS n_pairs, sum(x) AS sx, sum(z) AS sz,
        |    sum(x * z) AS sxz, sum(x * x) AS sxx, sum(z * z) AS szz
        |  FROM pairs GROUP BY 1),
        |f AS (
        |  SELECT lag, n_pairs,
        |    n_pairs * sxz - sx * sz AS num,
        |    n_pairs * sxx - sx * sx AS den1,
        |    n_pairs * szz - sz * sz AS den2
        |  FROM a)
        |SELECT lag, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS r_sign,
        |  CASE WHEN n_pairs < 3 OR den1 = 0 OR den2 = 0 THEN NULL
        |       ELSE CAST(floor(1000000.0 * CAST(num AS DOUBLE)
        |         * CAST(num AS DOUBLE) / (CAST(den1 AS DOUBLE)
        |         * CAST(den2 AS DOUBLE))) AS BIGINT)
        |  END AS r_sq_micros
        |FROM f ORDER BY lag""".stripMargin,
    // CUSUM replay: same day buckets, exact n·cumsum − t·total, the
    // (max |S|, earliest day) argmax joined onto every row
    "x132_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(sum(y) AS BIGINT) AS tt,
        |        CAST(count(*) AS BIGINT) AS nd FROM daily),
        |s AS (
        |  SELECT day, y,
        |    CAST(row_number() OVER (ORDER BY day) AS INTEGER) AS t,
        |    CAST(sum(y) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cy
        |  FROM daily),
        |dev AS (
        |  SELECT day, y, t, CAST(nd * cy - t * tt AS BIGINT) AS s_dev
        |  FROM s, tot),
        |cp AS (
        |  SELECT day AS cp_day, CAST(abs(s_dev) AS BIGINT) AS max_abs_dev
        |  FROM dev ORDER BY abs(s_dev) DESC, day LIMIT 1)
        |SELECT day, y, t, s_dev, cp_day, max_abs_dev
        |FROM dev, cp ORDER BY day""".stripMargin,
    "x88_event_anomaly" ->
      """WITH cnt AS (
        |  SELECT event_type AS series,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS bucket,
        |    count(*) AS n
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |fr AS (
        |  SELECT series, bucket, n,
        |    count(*) OVER w AS np,
        |    CAST(sum(n) OVER w AS BIGINT) AS s1,
        |    CAST(sum(n * n) OVER w AS BIGINT) AS s2
        |  FROM cnt
        |  WINDOW w AS (PARTITION BY series ORDER BY bucket
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT series, bucket, n, coalesce(np, 0) AS n_prev,
        |  CASE WHEN np >= 8 AND np * s2 - s1 * s1 > 0 THEN
        |    round(CAST(n * np - s1 AS DOUBLE)
        |      / sqrt(CAST(np * s2 - s1 * s1 AS DOUBLE))
        |      * sqrt(CAST(np AS DOUBLE)), 6)
        |  END AS z
        |FROM fr ORDER BY series, bucket""".stripMargin,
    // transition matrix: per-user lag over (ts, event_id), (from, to)
    // counts, integer-micro conditional probability by div
    "x89_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS ty,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |pairs AS (
        |  SELECT prev AS from_type, ty AS to_type, count(*) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n
        |  FROM pairs GROUP BY 1)
        |SELECT from_type, to_type, n, (n * 1000000) // row_n AS p_micro
        |FROM pairs JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    // majority vote: (item, label) counts, winner by row_number over
    // (count DESC, label) — the q20-established regexp spelling for the
    // props key; NULL props/labels carry no vote in either engine
    "x74_label_votes" ->
      """WITH v AS (
        |  SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS item,
        |    event_type AS label
        |  FROM events WHERE props IS NOT NULL AND event_type IS NOT NULL),
        |c AS (SELECT item, label, count(*) AS n_label FROM v GROUP BY 1, 2),
        |t AS (SELECT item, CAST(sum(n_label) AS BIGINT) AS n_votes,
        |    count(*) AS n_labels FROM c GROUP BY 1),
        |w AS (SELECT item, label, n_label,
        |    row_number() OVER (PARTITION BY item ORDER BY n_label DESC, label) AS rn
        |  FROM c)
        |SELECT w.item, t.n_votes, t.n_labels, w.label AS majority_label,
        |  w.n_label AS majority_n,
        |  round(CAST(w.n_label AS DOUBLE) / t.n_votes, 6) AS agreement
        |FROM w JOIN t ON t.item = w.item WHERE rn = 1
        |ORDER BY w.item""".stripMargin,
    // preference pairs: the chosen row is a full-frame first_value over
    // (rating DESC, id) — the same single window the Spark plan runs;
    // ties with the chosen and NULL ratings emit nothing
    "x56_preference_pairs" ->
      """WITH r AS (
        |  SELECT user_id AS prompt_id, event_id AS response_id,
        |    CAST(value AS DOUBLE) AS rating
        |  FROM events WHERE value IS NOT NULL),
        |w AS (
        |  SELECT prompt_id, response_id, rating,
        |    first_value(response_id) OVER win AS chosen_id,
        |    first_value(rating) OVER win AS chosen_rating
        |  FROM r
        |  WINDOW win AS (PARTITION BY prompt_id
        |    ORDER BY rating DESC, response_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT prompt_id, chosen_id, response_id AS rejected_id,
        |  round(chosen_rating - rating, 6) AS margin
        |FROM w WHERE rating < chosen_rating
        |ORDER BY prompt_id, rejected_id""".stripMargin,
    // turn masks: same token spelling as the text oracles, running
    // cumsum + row_number over the unique (ts, event_id) order; window
    // sum(BIGINT) promotes to HUGEINT in DuckDB — cast back
    "x54_turn_masks" ->
      """WITH turns AS (
        |  SELECT user_id AS conv_id, ts, event_id, event_type AS role,
        |    CAST(len(list_filter(string_split(lower(
        |      concat_ws(' ', event_type, props)), ' '), t -> t <> ''))
        |      AS BIGINT) AS n_toks
        |  FROM events),
        |w AS (
        |  SELECT conv_id, role, n_toks,
        |    CAST(row_number() OVER win AS INTEGER) AS turn_idx,
        |    CAST(sum(n_toks) OVER win AS BIGINT) AS tok_end
        |  FROM turns
        |  WINDOW win AS (PARTITION BY conv_id ORDER BY ts, event_id))
        |SELECT conv_id, turn_idx, role, n_toks,
        |  tok_end - n_toks AS tok_start, tok_end,
        |  role IN ('purchase', 'signup') AS train_on
        |FROM w ORDER BY conv_id, turn_idx""".stripMargin,
    // day buckets via integer floor-division on epoch ms (both engines
    // truncate the µs timestamp the same way — the q21 idiom)
    "q28_retention" ->
      """WITH e AS (
        |  SELECT user_id,
        |    (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000) * 86400000 AS p,
        |    event_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, min(p) AS cohort_ms FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, p FROM e)
        |SELECT cohort_ms,
        | (p - cohort_ms) // 86400000 AS offset,
        | count(DISTINCT user_id) AS n_users
        |FROM a JOIN c USING (user_id)
        |WHERE p >= cohort_ms
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // ordered-funnel fold replayed step by step in chained CTEs; list_min
    // of an emptied list is NULL, and x > NULL filters to empty, so NULL
    // propagates down the steps exactly like the Spark fold
    "q27_funnel" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |a AS (
        |  SELECT user_id,
        |    list_sort(list(ts) FILTER (WHERE event_type = 'view')) AS l0,
        |    list_sort(list(ts) FILTER (WHERE event_type = 'click')) AS l1,
        |    list_sort(list(ts) FILTER (WHERE event_type = 'purchase')) AS l2
        |  FROM e GROUP BY 1),
        |s0 AS (SELECT *, list_min(l0) AS t0 FROM a),
        |s1 AS (SELECT *, list_min(list_filter(l1, x -> x > t0)) AS t1 FROM s0),
        |s2 AS (SELECT *, list_min(list_filter(l2, x -> x > t1)) AS t2 FROM s1)
        |SELECT user_id,
        | CAST((t0 IS NOT NULL) AS INTEGER) + CAST((t1 IS NOT NULL) AS INTEGER) +
        |   CAST((t2 IS NOT NULL) AS INTEGER) AS reached,
        | epoch_ms(t0) AS t1_ms, epoch_ms(t1) AS t2_ms, epoch_ms(t2) AS t3_ms
        |FROM s2 ORDER BY user_id""".stripMargin,
    "q11_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
        | CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,
    "q11b_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status, coalesce(o_orderpriority,'ALL') AS priority,
        | CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        | sum(CAST(round(o_totalprice*100,0) AS BIGINT))/100.0 AS revenue, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,
    "q11c_grouping_sets" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
        | sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "q12_window_rank" ->
      """SELECT * FROM (
        | SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        | FROM customer
        | WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |) WHERE rn <= 20 ORDER BY c_mktsegment, rn""".stripMargin,
    "q13_window_analytic" ->
      """SELECT user_id, event_id,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | first_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value_u,
        | sum(CAST(round(value*100,0) AS BIGINT)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS run_sum,
        | count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q21_window_tumbling" ->
      """SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 900000) * 900000 AS window_start_ms,
        | event_type, count(*) AS n,
        | sum(CAST(round(value*100,0) AS BIGINT))/100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start_ms, event_type""".stripMargin,
    "q21b_window_sliding" ->
      """SELECT window_start_ms, count(*) AS n FROM (
        | SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 900000) * 900000 AS window_start_ms FROM events
        | UNION ALL
        | SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 900000) * 900000 - 900000 FROM events
        |) GROUP BY 1 ORDER BY window_start_ms""".stripMargin,
    "q22_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |  CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP)) - lag(epoch_ms(CAST(ts AS TIMESTAMP)), 1)
        |    OVER (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) > 1800000
        |   THEN 1
        |   WHEN lag(epoch_ms(CAST(ts AS TIMESTAMP)), 1)
        |    OVER (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) IS NULL
        |   THEN 1 ELSE 0 END AS new_session
        | FROM events),
        |sess AS (
        | SELECT user_id, event_id, ts_ms,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms,
        | count(*) AS n_events
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q23_dedup_keyed" ->
      """SELECT user_id, event_type, event_id, ts_ms FROM (
        | SELECT user_id, event_type, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) AS rn
        | FROM events
        |) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    // correlated top-1, NOT DuckDB's ASOF JOIN: ASOF resolves only the
    // ts inequality, so among SAME-ts signups it returns an arbitrary
    // row, while the Spark window's (ts, is_left, event_id) order pins
    // the max event_id — the explicit ORDER BY replays that tie-break
    "q24_asof_join" ->
      """SELECT l.event_id, l.user_id,
        | (SELECT r.event_id
        |  FROM events r
        |  WHERE r.event_type = 'signup' AND r.user_id = l.user_id
        |    AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP)
        |  ORDER BY CAST(r.ts AS TIMESTAMP) DESC, r.event_id DESC
        |  LIMIT 1) AS asof_signup_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ORDER BY l.event_id""".stripMargin)
}
