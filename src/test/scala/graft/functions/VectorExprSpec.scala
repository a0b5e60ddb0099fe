package graft.functions

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class VectorExprSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def dotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("native CosineSimilarity is bit-equal to the composed built-in form") {
    val e = Tables.t(spark, d, "embeddings").limit(200)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(5000)
    val both = pairs.select(
      VectorFunctions.cosine_sim(col("a.embedding"), col("b.embedding")).as("native"),
      (dotD(col("a.embedding"), col("b.embedding")) /
        (sqrt(dotD(col("a.embedding"), col("a.embedding"))) *
          sqrt(dotD(col("b.embedding"), col("b.embedding"))))).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
    assert(both.count() > 0)
  }

  test("dot_product with precomputed norms is bit-equal to cosine_sim") {
    val e = Tables.t(spark, d, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding"),
        sqrt(VectorFunctions.dot_product(col("embedding"), col("embedding"))).as("nrm"))
    val both = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(3000)
      .select(
        (VectorFunctions.dot_product(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("viaDot"),
        VectorFunctions.cosine_sim(col("a.embedding"), col("b.embedding")).as("direct"))
    assert(both.filter(col("viaDot") =!= col("direct")).count() == 0)
    assert(both.count() > 0)
  }

  test("expression works via SQL registration and survives codegen") {
    VectorFunctions.register(spark)
    Tables.t(spark, d, "embeddings").limit(10).createOrReplaceTempView("emb_t")
    val rows = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS s
        |FROM emb_t a JOIN emb_t b ON a.vec_id <> b.vec_id""".stripMargin).collect()
    assert(rows.length == 90 && rows.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
  }

  test("pack_int8 bytes equal the columnar quantizer's values; unpack round-trips") {
    import VectorFunctions.{pack_int8, unpack_int8}
    val e = Tables.t(spark, d, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding"),
        (aggregate(col("embedding"), lit(0.0),
          (a, x) => greatest(a, abs(x.cast("double")))) / 127.0).as("scale"))
      .filter(col("scale") > 0)
    val packed = e.select(col("vec_id"), col("embedding"), col("scale"),
      pack_int8(col("embedding"), col("scale")).as("qvec"))
    // byte 1 == the columnar form's q1 (same half-up rule), two's complement
    val cmp = packed.select(
      // unpack at scale 1.0 surfaces the raw signed byte values
      element_at(unpack_int8(col("qvec"), lit(1.0)), 1).cast("int").as("b1"),
      floor(element_at(col("embedding"), 1).cast("double") / col("scale") + lit(0.5))
        .cast("int").as("q1"))
    assert(cmp.filter(col("b1") =!= col("q1")).count() == 0)
    // round-trip: |unpack(pack(x)) - x| <= scale/2 per element
    val rt = packed
      .select(col("embedding"), col("scale"),
        unpack_int8(col("qvec"), col("scale")).as("back"))
      .select(aggregate(
        zip_with(col("embedding"), col("back"),
          (x, y) => abs(x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => greatest(a, x)).as("maxerr"), col("scale"))
    assert(rt.filter(col("maxerr") > col("scale") / 2 + lit(1e-9)).count() == 0)
    assert(rt.count() > 0)
  }

  test("pack_int8 yields null for a zero scale; byte count equals dims") {
    import VectorFunctions.pack_int8
    import spark.implicits._
    val v = Seq((1L, Seq(0.5f, -0.25f, 0.125f), 0.5 / 127.0),
      (2L, Seq(0f, 0f, 0f), 0.0)).toDF("id", "emb", "scale")
    val out = v.select(col("id"), pack_int8(col("emb"), col("scale")).as("q"))
      .orderBy(col("id")).collect()
    assert(out(0).getAs[Array[Byte]](1).length == 3)
    assert(out(0).getAs[Array[Byte]](1)(0) == 127.toByte)
    assert(out(1).isNullAt(1)) // zero vector: no scale, null not garbage
  }

  test("pack_int8 saturates an undersized scale instead of wrapping signs") {
    import VectorFunctions.pack_int8
    import spark.implicits._
    // scale far too small for the values: q = 200 would wrap to -56 as a
    // raw byte cast — must clamp to ±127 like every standard quantizer
    val v = Seq((1L, Seq(2.0f, -2.0f), 0.01)).toDF("id", "emb", "scale")
    val b = v.select(pack_int8(col("emb"), col("scale")).as("q"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(b(0) == 127.toByte && b(1) == -127.toByte)
  }

  test("int8_dot rejects mismatched packed dimensions instead of truncating") {
    import VectorFunctions.int8_dot
    import spark.implicits._
    val v = Seq((Array[Byte](1, 2, 3), Array[Byte](1, 2)))
      .toDF("a", "b")
    val ex = intercept[Exception] {
      v.select(int8_dot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("dimensions differ")))
    // equal dims still work
    val ok = Seq((Array[Byte](1, 2, 3), Array[Byte](4, 5, 6))).toDF("a", "b")
      .select(int8_dot(col("a"), col("b"))).collect()(0).getLong(0)
    assert(ok == 1 * 4 + 2 * 5 + 3 * 6)
  }

  test("cosine_sim and dot_product reject mismatched dimensions instead of truncating") {
    import spark.implicits._
    val v = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    Seq(VectorFunctions.cosine_sim _, VectorFunctions.dot_product _).foreach { fn =>
      val ex = intercept[Exception] {
        v.select(fn(col("a"), col("b"))).collect()
      }
      assert(causes(ex).exists(c => c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("dimensions differ")))
    }
  }

  test("null and zero-vector inputs yield null, not NaN") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS z,
        |       cosine_sim(CAST(NULL AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>)) AS n""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
