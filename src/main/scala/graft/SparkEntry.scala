package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry (plus a DuckDB oracle where SQL-expressible) per
  * operator in SURVEY.md §2's inventory; definitions live in graft.ops. */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.defs, Relational.oracles),
      (ReplayQueries.defs, ReplayQueries.oracles),
      (Windows.defs, Windows.oracles),
      (Functions.defs, Functions.oracles),
      (DedupOps.defs, DedupOps.oracles),
      (SamplingOps.defs, SamplingOps.oracles),
      (TextOps.defs, TextOps.oracles),
      (VectorOps.defs, VectorOps.oracles),
      (MultimodalOps.defs, MultimodalOps.oracles),
      (graft.streaming.StreamingOps.defs, graft.streaming.StreamingOps.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core capability as one plan: scan events, derive the
    * speedup-6480 replay schedule, emit in event-time order. */
  def entry(spark: SparkSession): DataFrame =
    ReplayQueries.r01Schedule(spark, "/root/testdata/sf0.001")

  private def dupKeys(maps: Seq[Map[String, _]]): Iterable[String] =
    maps.flatMap(_.keys).groupBy(identity)
      .collect { case (k, v) if v.size > 1 => k }

  /** One entry per implemented operator from SURVEY.md §2.
    * Map ++ silently keeps the LAST definition — a key registered by two
    * modules would shadow one implementation (or one oracle) and fail
    * only as a mysterious oracle mismatch, so both merges reject
    * duplicates at the contract boundary. lazy vals: the merge and the
    * checks run once per JVM, not per access. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val dups = dupKeys(modules.map(_._1))
    require(dups.isEmpty, s"query keys registered twice: ${dups.mkString(", ")}")
    modules.map(_._1).reduce(_ ++ _)
  }

  /** The queries DECLARED to have no DuckDB oracle — each a sketch whose
    * internal state IS the algorithm (different sketch parameters across
    * engines make equality meaningless; see ORACLES.md §8) — mapped to
    * the EXACT TWIN whose hash-checked query bounds it (the spec-pinned
    * pairing, now machine-readable: Verify dumps this map as
    * rows_only_twins.json next to oracle_sql.json, so a correctness
    * artifact's `no_oracle` rows are self-describing instead of
    * requiring ORACLES.md §8 spelunking). Every entry carries a spec
    * bounding it against its twin (LlmOpsSpec / FunctionsSpec). Closed
    * list: a new query missing from BOTH this map and oracleSql fails
    * registration below, so an oracle can't be forgotten silently.
    * Round 12 moved q08d and x31g OUT of this set: their registered
    * queries now emit the GK rank-bound audit (booleans computed
    * in-plan against exact rank counts), which IS hash-comparable —
    * only the HLL count (q09) and the sketch tie-breaks (x28m) remain
    * value-incomparable across engines. */
  val rowsOnlyTwins: Map[String, String] = Map(
    // HLL ndv estimate vs the exact distinct counts the same plan groups
    "q09_approx_distinct" -> "q08_distinct_agg",
    // CMS/sketch heavy hitters vs the exact top-term counts
    "x28m_heavy_hitters" -> "x28d_tfidf_top_term")
  val rowsOnlyByDesign: Set[String] = rowsOnlyTwins.keySet

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = {
    val dups = dupKeys(modules.map(_._2))
    require(dups.isEmpty, s"oracle keys registered twice: ${dups.mkString(", ")}")
    val sql = modules.map(_._2).reduce(_ ++ _)
    val orphans = sql.keySet -- queries.keySet
    require(orphans.isEmpty,
      s"oracles without a registered query: ${orphans.mkString(", ")}")
    val unoracled = queries.keySet -- sql.keySet -- rowsOnlyByDesign
    require(unoracled.isEmpty,
      s"queries with neither an oracle nor a rows-only declaration: ${unoracled.mkString(", ")}")
    val shadowed = rowsOnlyByDesign intersect sql.keySet
    require(shadowed.isEmpty,
      s"declared rows-only but an oracle exists: ${shadowed.mkString(", ")}")
    // a twin must itself be hash-checked — a rows-only query bounded by
    // another rows-only query would be a circular declaration
    val badTwins = rowsOnlyTwins.values.toSet -- sql.keySet
    require(badTwins.isEmpty,
      s"rows-only twins without a hash-checked oracle: ${badTwins.mkString(", ")}")
    sql
  }
}
