package graft

/** Drives the SparkSessionExtensions registration: the shared test session
  * is built with `spark.sql.extensions=graft.GraftExtensions` (SparkSpec),
  * so the native functions must resolve from plain SQL. */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions=graft.GraftExtensions registers the SQL functions") {
    val r = spark.sql(
      """SELECT
        | cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |            CAST(array(1.0, 1.0) AS ARRAY<FLOAT>)) AS c,
        | size(shingle_hashes('a b c d', 3)) AS nsh,
        | size(srp_buckets(CAST(array(1.0, -2.0) AS ARRAY<FLOAT>), 4, 3)) AS nbk
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(r.getInt(1) == 2 && r.getInt(2) == 4)
  }

  test("non-literal size argument is rejected with a named error") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
