package graft.tools

/** Per-query timing attribution: run the named SparkEntry queries N times
  * each in a Bench-identical session (same builder, same table + engine
  * warm-ups, via [[BenchSession]]) and print every attempt — the
  * isolated-run half of the dual-timing evidence the round notes cite
  * when a sweep number and a local number disagree.
  *
  * Usage: sbt "runMain graft.tools.QueryTime x26b_minhash_lsh [more...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_RUNS (default 3).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = BenchSession.open()
    BenchSession.warmTables(spark, sfDir)
    BenchSession.warmEngine(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name: not registered")
        case Some(fn) =>
          // scrub before each query's run group (the r16 Bench
          // discipline): run 1 is a true cold (pays its own cache
          // builds, not predecessors' garbage), runs 2..n are warm
          BenchSession.scrub()
          val times = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(s"$name: " + times.map(t => f"$t%.3f").mkString(" "))
      }
    }
    spark.stop()
  }
}
