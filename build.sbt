ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "amazonkinesisreplayspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 concurrent local tasks share this one heap. Measured A/B on this
  // box (replay warm-run throughput / sf0.1 SQL bench total):
  // 8g ≈ 118k/s / 35.8s, 12g ≈ 170-280k/s / 29.6s, 16g ≈ 122k/s,
  // 24g ≈ 105-125k/s / 31.4s — 12g wins both workloads; the larger heaps
  // spend up to ~45% CPU in kernel time (page-fault/THP pressure) on the
  // allocation-heavy replay path. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // pin the heap floor to the ceiling and the collector explicitly:
  // cross-round replay-bench medians ranged 541-642k ev/s with identical
  // code, and heap-resize + collector-ergonomics drift is the kind of
  // nondeterminism that masquerades as a regression. G1 is the JDK 17
  // default — pinned so a future JDK can't silently switch it.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+UseG1GC",
  // Spark drivers churn weak/soft references (ContextCleaner tracks
  // every RDD/broadcast/accumulator by WeakReference); G1 processes
  // reference queues single-threaded inside the pause unless told not
  // to — measured on this box as multi-second GC stalls billed to
  // whichever query ran next (r16 LitterProbe: x167 warm 86s -> 1.6s
  // once the backlog is cleared). Parallel ref processing attacks the
  // root; the bench additionally scrubs between queries.
  "-XX:+ParallelRefProcEnabled",
  // blanks filtered: "".split(" ") yields Array("") and an empty-string
  // javaOption breaks the forked JVM launch (r16 ADVICE)
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.split("\\s+")).filter(_.nonEmpty)

// ---- test-suite wall time (r16 verdict #2: the driver's `sbt test`
// timed out at 501 tests / ~24 min on this box). The suites share one
// local[4] session INSIDE each JVM but are independent of each other
// (temp dirs per test; only PlanSpec touches spark-warehouse), so run
// each suite in its OWN forked JVM, several at a time. Suite wall time
// becomes max(suite) instead of sum(suite): measured 1433 s -> ~350 s.
// Tests get a smaller heap than the bench (they hold tiny fixtures;
// 4 concurrent 12g heaps would pin 48g for no benefit).
Test / javaOptions := {
  val base = javaOptions.value
  val mem = sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "5g")
  base.filterNot(o => o.startsWith("-Xmx") || o.startsWith("-Xms")) ++
    Seq(s"-Xmx$mem", s"-Xms1g")
}
Test / testGrouping := {
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  (Test / definedTests).value
    .groupBy(_.name) // one group per suite class
    .toSeq.sortBy(_._1)
    .map { case (name, defs) =>
      Tests.Group(name, defs, Tests.SubProcess(opts))
    }
}
// how many suite JVMs run at once: 5 x 5g heaps on a 128 GiB / 32-core
// box leaves the CPUs shared ~6 ways per suite's local[4] session.
// REPLACE the default restrictions — sbt ships Tags.limit(ForkedTestGroup, 1)
// and restrictions compose as minimums, so `+=` could never raise it.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(32),
  Tags.limit(Tags.ForkedTestGroup,
    sys.env.getOrElse("SPARK_GRAFT_TEST_FORKS", "5").toInt))
