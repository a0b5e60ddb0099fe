package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drives the parametric library surface on hand-built DataFrames (NOT the
  * fixture tables) — proving the operators work on any corpus with an
  * id/text or id/embedding column, which is the point of the facade. */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, "the cat sat on the mat"),
    (11L, "the cat sat on the mat"), // exact dup of 10
    (12L, "the cat sat on the red mat today ok"), // near dup of 10/11
    (13L, "completely different words entirely here now"),
    (14L, "")).toDF("id", "body")

  test("exactDedup groups byte-identical docs under the min id") {
    val out = TrainingData.exactDedup(corpus, "id", "body")
      .orderBy("canonical_id").collect()
    val dupRow = out.find(_.getLong(1) == 10L).get
    assert(dupRow.getLong(2) == 2) // 10 and 11
    assert(out.length == 4) // 4 distinct contents (incl. the empty doc)
  }

  test("nearDupPairs finds the exact and near duplicates at the right thresholds") {
    val strict = TrainingData.nearDupPairs(corpus, "id", "body", 0.99)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(strict == Set((10L, 11L))) // only the byte-identical pair at ~1.0
    val loose = TrainingData.nearDupPairs(corpus, "id", "body", 0.3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(loose == Set((10L, 11L), (10L, 12L), (11L, 12L)))
    assert(!loose.exists(p => p._1 == 13L || p._2 == 13L))
  }

  test("dedupClusters turns the pair set into one transitive group") {
    val pairs = Seq((10L, 11L), (11L, 12L), (40L, 41L)).toDF("d1", "d2")
    val labels = TrainingData.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 40L -> 40L, 41L -> 40L))
  }

  test("tokenStats and fingerprint handle normal and empty docs") {
    val stats = TrainingData.tokenStats(corpus, "id", "body")
      .orderBy("id").collect()
    assert(stats(0).getInt(1) == 6) // "the cat sat on the mat"
    assert(stats(0).getInt(2) == 5) // "the" twice
    assert(stats(4).getInt(1) == 0 && stats(4).isNullAt(4)) // empty doc: NULL avg
    val fp = TrainingData.fingerprint(corpus, "id", "body")
      .orderBy("id").collect()
    assert(fp(0).getString(1) == fp(1).getString(1)) // dups share a fingerprint
    assert(fp(0).getString(1) != fp(3).getString(1))
    assert(fp.forall(_.getString(1).length == 16))
  }

  test("cosineTopK ranks an orthogonal basis correctly") {
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)), // closest to 1
      (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(0.7f, 0.7f, 0f, 0f))).toDF("id", "emb")
    val top = TrainingData.cosineTopK(vecs, vecs.filter(col("id") === 1), "id", "emb", 2)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(2L, 4L)) // rank 1 = 2, rank 2 = 4
    assert(top(0).getDouble(2) > top(1).getDouble(2))
  }

  test("quantizeInt8 round-trips a known vector") {
    val vecs = Seq((1L, Seq(1.27f, -1.27f, 0.635f, 0f))).toDF("id", "emb")
    val r = TrainingData.quantizeInt8(vecs, "id", "emb", 4).collect()(0)
    assert(r.getInt(2) == 127 && r.getInt(3) == -127) // ±absmax saturate
    assert(r.getInt(4) == 64 || r.getInt(4) == 63) // half-scale element
    assert(r.getInt(6) >= 1) // at least the ±127 entries count as saturated
    assert(r.getDouble(7) >= 0.0) // mse defined
  }

  test("topBigrams counts adjacent pairs across the corpus") {
    val top = TrainingData.topBigrams(corpus, "body", 4).collect()
    // docs 10, 11, 12 share "the cat", "cat sat", "sat on", "on the" → 3 each
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("cat sat", 3L), ("on the", 3L), ("sat on", 3L), ("the cat", 3L)))
  }
}
