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

  test("minhashNearDupPairs finds the exact-dup pair with verified jaccard") {
    val strict = TrainingData.minhashNearDupPairs(corpus, "id", "body", 0.99)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(strict == Set((10L, 11L))) // identical docs always share all bands
    // every LSH pair is a true pair (candidates are exact-verified)
    val loose = TrainingData.minhashNearDupPairs(corpus, "id", "body", 0.3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val truth = TrainingData.nearDupPairs(corpus, "id", "body", 0.3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(loose.subsetOf(truth))
  }

  test("annTopKLsh returns exact-verified similarities for its candidates") {
    val vecs = (1L to 30L).map(i =>
      (i, (0 until 8).map(j => ((i * 7 + j * 3) % 11 - 5).toFloat))).toDF("id", "emb")
    val qs = vecs.filter(col("id") <= 3)
    val ann = TrainingData.annTopKLsh(vecs, qs, "id", "emb", k = 3, tables = 6, bits = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ann.nonEmpty)
    // each returned sim must equal the brute-force sim for that pair
    val brute = TrainingData.cosineTopK(vecs, qs, "id", "emb", k = 29)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ann.foreach { case (pair, sim) =>
      assert(brute(pair) == sim, s"pair $pair: ann sim $sim vs exact ${brute(pair)}")
    }
    // ranks are dense per query, 1..n
    val byQ = ann.map(_._1).groupBy(_._1)
    byQ.foreach { case (_, pairs) => assert(pairs.length <= 3) }
  }

  test("annTopKIvf probes clusters and returns exact-verified similarities") {
    val vecs = (1L to 40L).map(i =>
      (i, (0 until 8).map(j => ((i * 13 + j * 5) % 17 - 8).toFloat))).toDF("id", "emb")
    val qs = vecs.filter(col("id") <= 3)
    val ivf = TrainingData.annTopKIvf(vecs, qs, "id", "emb",
      k = 3, nClusters = 4, nProbe = 2) // 8-dim: dimension inferred from seeds
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ivf.nonEmpty)
    val brute = TrainingData.cosineTopK(vecs, qs, "id", "emb", k = 39)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivf.foreach { case (pair, sim) =>
      assert(brute(pair) == sim, s"pair $pair: ivf sim $sim vs exact ${brute(pair)}")
    }
    assert(ivf.map(_._1).groupBy(_._1).forall(_._2.length <= 3))
  }

  test("shingles relation is shareable: FromShingles variants equal the inline forms") {
    val sh = TrainingData.shingles(corpus, "id", "body").persist()
    try {
      val exactShared = TrainingData.nearDupPairsFromShingles(sh, 0.3)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      val exactInline = TrainingData.nearDupPairs(corpus, "id", "body", 0.3)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(exactShared == exactInline && exactShared.nonEmpty)
      val lshShared = TrainingData.minhashNearDupPairsFromShingles(sh, 0.99)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(lshShared == Set((10L, 11L)))
    } finally sh.unpersist()
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
