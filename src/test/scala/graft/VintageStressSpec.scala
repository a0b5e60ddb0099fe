package graft

import scala.sys.process._

/** The fixture-vintage stress gate, IN the suite: build the pathological
  * corpus variant (empty/whitespace/1-token/all-stopword documents, dup +
  * zero vectors, NULL-props/unknown-type events — scripts/stress_vintage.py),
  * dump every registered query over it, and run the DuckDB oracle compare
  * (scripts/check.py). Round 7 died to a fixture-vintage drift and the
  * hand-run harness caught three latent oracle bugs in round 8 (x28e
  * NULL-vs-'' fingerprint, x41/x46 empty-list joins) — this spec makes the
  * degenerate-document gate run on every `sbt test` instead of only when
  * someone remembers to.
  *
  * Requires the driver-side python3 + duckdb toolchain (the same one the
  * real correctness gate runs on); if python/duckdb are absent the spec
  * cancels rather than fails, so the suite stays runnable on a bare box.
  */
class VintageStressSpec extends SparkSpec {

  private val corpus = "/tmp/graft_stress_corpus"
  private val out = "/tmp/graft_stress_vout"

  test("all queries stay oracle-green on the pathological fixture vintage") {
    val have = (try "python3 -c \"import duckdb\"".! == 0
      catch { case _: Throwable => false })
    assume(have, "python3+duckdb unavailable — vintage gate skipped")

    val build = Seq("python3", "scripts/stress_vintage.py",
      "/root/testdata/sf0.001", corpus).!
    assert(build == 0, "stress corpus build failed")

    val failedDumps = Verify.dump(spark, corpus, out)
    assert(failedDumps.isEmpty, s"query dumps failed: $failedDumps")

    // check.py exits nonzero on ANY row/schema/hash mismatch; its stdout
    // carries the per-query verdicts, surfaced on failure
    val log = new StringBuilder
    val code = Process(Seq("python3", "scripts/check.py", corpus, out))
      .!(ProcessLogger(l => log.append(l).append('\n'),
        l => log.append(l).append('\n')))
    assert(code == 0, s"oracle compare failed:\n$log")
  }
}
