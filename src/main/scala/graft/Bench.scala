package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the machine's core count (the local[32] contract), not a
    // fixed small number — an unset env var must not quietly serialize the
    // quadratic baselines onto 4 threads
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen/parquet-reader startup AND the OS page cache for
    // EVERY table — otherwise first-touch I/O is billed to whichever query
    // happens to scan a table first (Map iteration order), making
    // round-over-round per-query deltas unattributable
    // Tables.t, not raw spark.read: events.parquet is TIMESTAMP(NANOS),
    // which a raw read rejects — the catch would hide that and leave the
    // one replay-query table cold
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { tbl =>
      try graft.Tables.t(spark, sfDir, tbl).foreach(_ => ())
      catch { case _: Throwable => () }
    }
    // engine warm-up beyond the page cache: the first broadcast join and
    // hash aggregation of a session pay one-time costs (janino compiler
    // init, broadcast thread pool, exchange machinery) of ~2s that would
    // otherwise be billed to whichever query Map iteration order puts
    // first, making per-query deltas unattributable round-over-round
    try {
      import org.apache.spark.sql.functions._
      val r = graft.Tables.t(spark, sfDir, "region")
      val n = graft.Tables.t(spark, sfDir, "nation")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1))).foreach(_ => ())
    } catch { case _: Throwable => () }
    // two timed executions per query, min reported: this box shows
    // intermittent hypervisor steal (vmstat st spikes) that lands 1-5 s on
    // whichever query is running; the min of two runs is the steady-state
    // latency of the plan, which is the number that is comparable
    // round-over-round and across scale factors
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // min over SUCCESSFUL runs only — a fast-failing run must not be
      // reported as a query's steady-state latency. A query that fails
      // BOTH runs goes under "errors", NOT into the timing map: a
      // sign-encoded sentinel there silently reads as a huge speedup to
      // any tool that sums or diffs the timings
      val runs = Seq(once(), once())
      val good = runs.filter(_._2).map(_._1)
      name -> good.minOption
    }
    val timed = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }.toSeq.sorted
    val qs = timed.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\":\"failed both runs\"")
      .mkString("{", ",", "}")
    val total = if (timed.nonEmpty) timed.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // durability: the driver captures a bounded stdout tail, which has
    // truncated a third of the per-query map in past rounds — the same
    // line on disk keeps every query round-over-round auditable. Best
    // effort: an unwritable cwd must not flip a fully-green bench to a
    // nonzero exit after the stdout line already went out
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json not written: ${e.getMessage}") }
    spark.stop()
  }
}
