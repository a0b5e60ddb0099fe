package graft.tools

/** Diagnostic for cross-query JVM litter (r16): runs named queries
  * sequentially on one BenchSession (the Bench sweep shape) and prints,
  * after each query's cold/warm pair, the block-manager storage still
  * held — orphaned localCheckpoint blocks survive PerAppCache.evictAll
  * until the lazy ContextCleaner gets a GC, and the squeezed unified
  * memory shows up as the NEXT queries' slowdown, not this one's.
  *
  * Usage: runMain graft.tools.LitterProbe <sfDir> <q1,q2,...> [gc]
  * With the trailing "gc" arg, System.gc() runs after each eviction —
  * the A/B that attributes the slowdown to uncollected litter.
  */
object LitterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val doGc = args.length > 2 && args(2) == "gc"
    val spark = BenchSession.open()
    BenchSession.warmTables(spark, sfDir)
    BenchSession.warmEngine(spark, sfDir)
    def storage(): String = {
      val sc = spark.sparkContext
      val n = sc.getPersistentRDDs.size
      val mb = sc.getRDDStorageInfo.map(_.memSize).sum / 1048576
      s"persistentRDDs=$n storageMB=$mb"
    }
    for (name <- names) {
      graft.ops.PerAppCache.evictAll()
      if (doGc) { System.gc(); Thread.sleep(200) }
      val fn = graft.SparkEntry.queries(name)
      def once(): (Double, Double) = {
        val st0 = BenchSession.stealSeconds()
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, BenchSession.stealSeconds() - st0)
      }
      val (c, cSt) = once(); val (w, wSt) = once()
      println(f"[probe] $name cold=$c%.2f($cSt%.1f stolen) " +
        f"warm=$w%.2f($wSt%.1f stolen) ${storage()} gc=$doGc")
    }
    spark.stop()
  }
}
