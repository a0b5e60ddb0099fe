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
        | size(srp_buckets(CAST(array(1.0, -2.0) AS ARRAY<FLOAT>), 4, 3)) AS nbk,
        | token_bigrams('a b c') AS bg
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(r.getInt(1) == 2 && r.getInt(2) == 4)
    assert(r.getSeq[String](3) == Seq("a b", "b c"))
  }

  test("quantization functions round-trip from plain SQL") {
    val r = spark.sql(
      """WITH v AS (SELECT CAST(array(1.27, -1.27, 0.635, 0.0) AS ARRAY<FLOAT>) AS emb,
        |                  CAST(0.01 AS DOUBLE) AS scale)
        |SELECT hex(pack_int8(emb, scale)) AS qhex,
        |       unpack_int8(pack_int8(emb, scale), scale) AS back,
        |       int8_dot(pack_int8(emb, scale), pack_int8(emb, scale)) AS selfdot,
        |       dot_product(emb, emb) AS fdot
        |FROM v""".stripMargin).collect()(0)
    // 127, -127, 63, 0 — float 0.635 is 0.63499997…, so /0.01 + 0.5
    // floors to 63 (exactly the double arithmetic the oracle runs too)
    assert(r.getString(0) == "7F813F00")
    val back = r.getSeq[Float](1)
    assert(math.abs(back(0) - 1.27f) < 0.005 && math.abs(back(1) + 1.27f) < 0.005)
    assert(r.getLong(2) == 127L * 127 + 127L * 127 + 63L * 63)
    assert(math.abs(r.getDouble(3) - (1.27 * 1.27 * 2 + 0.635 * 0.635)) < 1e-6)
  }

  test("bucket_index resolves from SQL with a foldable bounds array") {
    val r = spark.sql(
      """SELECT bucket_index(CAST(25.0 AS DOUBLE), array(10.0, 20.0, 30.0)) AS b,
        |       bucket_index(CAST(5.0 AS DOUBLE), array(10.0, 20.0, 30.0)) AS lo,
        |       bucket_index(CAST(99.0 AS DOUBLE), array(10.0, 20.0, 30.0)) AS hi
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 0 && r.getInt(2) == 3)
    val e = intercept[Exception] {
      spark.sql("SELECT bucket_index(CAST(1.0 AS DOUBLE), array(rand()))").collect()
    }
    assert(e.getMessage.contains("bucket_index"))
    // NULL bounds elements would silently read as 0.0 — must be rejected
    val n = intercept[Exception] {
      spark.sql(
        "SELECT bucket_index(CAST(1.0 AS DOUBLE), array(10.0, CAST(NULL AS DOUBLE)))"
      ).collect()
    }
    assert(n.getMessage.contains("NULL"))
  }

  test("non-literal size argument is rejected with a named error") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("sha32_kgrams and winnow_select resolve from SQL and agree with the Column API") {
    val sqlRow = spark.sql(
      """SELECT sha32_kgrams('the quick brown fox jumps', 3) AS kh,
        |       winnow_select(sha32_kgrams('the quick brown fox jumps', 3), 2) AS w
        |""".stripMargin).collect()(0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val api = Seq("the quick brown fox jumps").toDF("t")
      .select(
        graft.functions.TextFunctions.sha32_kgrams(col("t"), 3).as("kh"),
        graft.functions.TextFunctions.winnow_select(
          graft.functions.TextFunctions.sha32_kgrams(col("t"), 3), 2).as("w"))
      .collect()(0)
    assert(sqlRow.getSeq[Long](0) == api.getSeq[Long](0))
    assert(sqlRow.getSeq[Int](1) == api.getSeq[Int](1))
    assert(sqlRow.getSeq[Long](0).length == 3) // 5 tokens → 3 positions
    val e = intercept[Exception] {
      spark.sql("SELECT winnow_select(array(1L, 2L), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
