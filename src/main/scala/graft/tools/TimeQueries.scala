package graft.tools

/** Local iteration timer: run named SparkEntry queries N times each on
  * one session and print per-attempt seconds — the quick cold/warm read
  * used while optimizing a single query (Bench remains the artifact
  * writer; this prints only).
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> <n> <q1,q2,...>
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, nStr, names) = args.take(3)
    val n = nStr.toInt
    val spark = BenchSession.open()
    spark.sparkContext.setLogLevel("WARN")
    BenchSession.warmTables(spark, sfDir)
    BenchSession.warmEngine(spark, sfDir)
    for (name <- names.split(",")) {
      val fn = graft.SparkEntry.queries(name)
      graft.ops.PerAppCache.evictAll()
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"[time] $name: " +
        ts.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
