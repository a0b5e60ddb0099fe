package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Cross-checks for the operators whose hashes aren't SQL-portable
  * (SURVEY.md §7.4 risk 5): the exact-Jaccard query is the in-repo oracle
  * for MinHash/SimHash/ANN. */
class LlmOpsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  private def pairSet(rows: Array[Row]): Set[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH candidates + verify reproduce the exact Jaccard pair set") {
    val exact = pairSet(DedupOps.x26Jaccard(spark, d).select("d1", "d2").collect())
    val lsh = pairSet(DedupOps.minhashPairs(spark, d).select("d1", "d2").collect())
    assert(exact.nonEmpty)
    assert(lsh == exact) // 16 hashes / 4 bands: recall 1.0 at jaccard ≥ 0.5 here
  }

  test("x117 incremental admission agrees with the batch LSH scan's cross pairs") {
    val full = pairSet(DedupOps.minhashPairs(spark, d).select("d1", "d2").collect())
    // the batch scan's mixed-parity pairs, oriented delta → base
    val crossRejects = full.collect {
      case (a, b) if (a % 10 == 0) != (b % 10 == 0) =>
        if (a % 10 == 0) (a, b) else (b, a)
    }.groupBy(_._1).map { case (k, v) => (k, (v.size.toLong, v.map(_._2).min)) }
    val got = DedupOps.x117IncrementalAdmission(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.nonEmpty && got.values.exists(!_._3),
      "fixture must exercise the reject path")
    got.foreach { case (id, (n, dupOf, admitted)) =>
      crossRejects.get(id) match {
        case Some((en, eMin)) =>
          assert(!admitted && n == en && dupOf == eMin, s"doc $id")
        case None => assert(admitted && n == 0L && dupOf == -1L, s"doc $id")
      }
    }
    // delta-delta near-dups must NOT reject an admission (only the
    // standing corpus gates newcomers)
    assert(got.keys.forall(_ % 10 == 0))
  }

  test("x107 audit counts agree with the exact/LSH relations it rides") {
    val exact = DedupOps.x26Jaccard(spark, d).count()
    val row = DedupOps.x107LshRecallAudit(spark, d).collect().head
    assert(row.getLong(0) == exact)            // n_exact == |x26|
    assert(row.getLong(2) <= row.getLong(0))   // caught <= exact
    assert(row.getLong(2) <= row.getLong(1))   // caught <= candidates
    // the suite's equivalence test (lsh == exact) implies full recall
    assert(row.getLong(3) == 1000000L)
  }

  test("simhash separates near-dups from random pairs by hamming distance") {
    val sims = DedupOps.simhash(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupPairs = pairSet(DedupOps.x26Jaccard(spark, d).select("d1", "d2").collect())
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dupDist = dupPairs.toSeq.map { case (a, b) => hamming(sims(a), sims(b)) }
    val ids = sims.keys.toSeq.sorted
    val randDist = ids.zip(ids.drop(251)).filterNot(p => dupPairs(p))
      .map { case (a, b) => hamming(sims(a), sims(b)) }
    val avgDup = dupDist.sum.toDouble / dupDist.size
    val avgRand = randDist.sum.toDouble / randDist.size
    assert(avgDup < avgRand / 2,
      s"simhash should separate: dup avg $avgDup vs random avg $avgRand")
  }

  test("ANN LSH top-k has useful recall vs brute-force cosine top-k") {
    val brute = pairSet(VectorOps.x27TopK(spark, d).select("q_id", "c_id").collect())
    val ann = pairSet(VectorOps.x27bAnnLsh(spark, d).select("q_id", "c_id").collect())
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.4, s"ANN recall $recall too low")
    // and the candidate set is genuinely restricted (it's an index, not a scan)
    assert(ann.size <= brute.size)
  }

  test("IVF ANN top-k has useful recall and is deterministic") {
    val brute = pairSet(VectorOps.x27TopK(spark, d).select("q_id", "c_id").collect())
    val ivf1 = VectorOps.x27cAnnIvf(spark, d).collect().map(_.toSeq)
    val ivf2 = VectorOps.x27cAnnIvf(spark, d).collect().map(_.toSeq)
    assert(ivf1.sameElements(ivf2)) // integer-space k-means → stable index
    val ivfPairs = ivf1.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    val recall = (brute & ivfPairs).size.toDouble / brute.size
    assert(recall >= 0.25, s"IVF recall $recall too low")
  }

  test("PQ ADC top-k has useful recall, exact sims, and a deterministic index") {
    val brute = VectorOps.x27TopK(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val pq1 = VectorOps.x27eAnnPq(spark, d).collect().map(_.toSeq)
    val pq2 = VectorOps.x27eAnnPq(spark, d).collect().map(_.toSeq)
    assert(pq1.sameElements(pq2)) // integer-space codebooks → stable index
    val pqPairs = pq1.map(r =>
      ((r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]),
        r(2).asInstanceOf[Double]))
    // 16 subspaces of 4 dims (16 B/vec): finer quantization cells than
    // the 8×8 geometry lifted measured recall from 0.6 into the >=0.8
    // regime; floor holds the frontier point the scaladoc claims
    val recall = (brute.map(_._1).toSet & pqPairs.map(_._1).toSet).size.toDouble / brute.size
    assert(recall >= 0.8, s"PQ recall $recall too low")
    // every returned sim is the EXACT cosine (re-ranked, not ADC-approx)
    val exact = brute.toMap
    pqPairs.foreach { case (pair, sim) =>
      exact.get(pair).foreach(e => assert(e == sim, s"$pair: $sim vs exact $e"))
    }
  }

  test("residual IVF-PQ: recall >= 0.7, deterministic, exact sims") {
    val brute = VectorOps.x27TopK(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val r1 = VectorOps.x27hAnnIvfPqResidual(spark, d).collect().map(_.toSeq)
    val r2 = VectorOps.x27hAnnIvfPqResidual(spark, d).collect().map(_.toSeq)
    assert(r1.sameElements(r2)) // both builds are integer-space-deterministic
    val pairs = r1.map(r =>
      ((r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]),
        r(2).asInstanceOf[Double]))
    // residual encoding is the recall lever: codebooks trained on
    // coarse-quantizer residuals spend their 16 entries/subspace on the
    // within-cluster detail, lifting the composed recall out of the
    // ~0.5 regime of the non-residual x27f (floor leaves regeneration
    // slack below the measured value)
    val recall = (brute.map(_._1).toSet & pairs.map(_._1).toSet).size.toDouble / brute.size
    assert(recall >= 0.7, s"residual IVF-PQ recall $recall below 0.7")
    // emitted sims are the EXACT cosines (re-ranked, not ADC scores)
    val exact = brute.toMap
    pairs.foreach { case (pair, sim) =>
      exact.get(pair).foreach(e => assert(e == sim, s"$pair: $sim vs exact $e"))
    }
  }

  test("IVF-PQ top-k: deterministic, exact sims, candidates confined to probed lists") {
    val brute = VectorOps.x27TopK(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val r1 = VectorOps.x27fAnnIvfPq(spark, d).collect().map(_.toSeq)
    val r2 = VectorOps.x27fAnnIvfPq(spark, d).collect().map(_.toSeq)
    assert(r1.sameElements(r2)) // both builds are integer-space-deterministic
    val pairs = r1.map(r =>
      ((r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]),
        r(2).asInstanceOf[Double]))
    // two stacked approximations: recall floor = the product regime
    // (IVF ~0.84 × PQ ~0.8+ measured separately after the 16×4 subspace
    // geometry); leave regeneration slack
    val recall = (brute.map(_._1).toSet & pairs.map(_._1).toSet).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall too low")
    // emitted sims are the EXACT cosines (re-ranked, not ADC scores)
    val exact = brute.toMap
    pairs.foreach { case (pair, sim) =>
      exact.get(pair).foreach(e => assert(e == sim, s"$pair: $sim vs exact $e"))
    }
    // the IVF restriction is real: every returned candidate sits in one
    // of its query's nProbe=4 probed clusters (recomputed independently)
    val emb = graft.Tables.t(spark, d, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val cent = VectorOps.ivfCentroids(spark, emb, 16)
    val probed = VectorOps.ivfProbe(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
          .toDF("q_id", "q_emb"),
        cent, VectorOps.ivfAssign(emb, cent), k = Int.MaxValue, nProbe = 4)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.map(_._1).foreach { case (q, c) =>
      assert(probed((q, c)), s"candidate $c outside query $q's probed clusters")
    }
  }

  test("parametric annTopKPq matches the fixture binding and bounds candidates") {
    val e = graft.Tables.t(spark, d, "embeddings")
    val out = graft.api.TrainingData.annTopKPq(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
        .withColumnRenamed("vec_id", "vid").withColumnRenamed("embedding", "emb")
        .select(org.apache.spark.sql.functions.col("vid").as("vec_id"),
          org.apache.spark.sql.functions.col("emb").as("embedding")),
      "vec_id", "embedding", k = 5, m = 16, refine = 32)
      .orderBy("q_id", "rank").collect().map(_.toSeq)
    val fixture = VectorOps.x27eAnnPq(spark, d).collect().map(_.toSeq)
    assert(out.sameElements(fixture))
    // ranks dense 1..≤5 per query
    val byQ = out.groupBy(_.head)
    byQ.values.foreach { rows =>
      assert(rows.map(_(3).asInstanceOf[Int]).sorted.toSeq == (1 to rows.size).toSeq)
    }
  }

  test("annTopKIvfPq defaults to residual encoding; opt-out is the naive composition") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.t(spark, d, "embeddings")
    val qs = emb.filter(col("vec_id") < 20)
    def run(residual: Boolean) = graft.api.TrainingData.annTopKIvfPq(
        emb, qs, "vec_id", "embedding", k = 5, nClusters = 16, nProbe = 4,
        m = VectorOps.PqM, codesPerSubspace = 16, refine = VectorOps.PqRefine,
        residual = residual)
      .orderBy("q_id", "rank").collect().map(_.toSeq)
    // the DEFAULT (residual = true) must reproduce the residual fixture
    // path exactly — the ≥0.7 recall floor asserted above transfers to
    // every API caller who doesn't opt out
    assert(run(residual = true).sameElements(
      VectorOps.x27hAnnIvfPqResidual(spark, d).collect().map(_.toSeq)))
    // the explicit opt-out reproduces the old raw-vector composition
    // (the ~0.5-floor trap, now a deliberate choice instead of a default)
    assert(run(residual = false).sameElements(
      VectorOps.x27fAnnIvfPq(spark, d).collect().map(_.toSeq)))
  }

  test("x52 tokenizer stats: fertility >= 1, zero OOV on the training half, char fallback proven") {
    val rows = TextOps.x52TokenizerStats(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nToks, nPieces, nOov, fert, oovFrac) =>
      // every word is at least one piece, so fertility >= 1 exactly
      assert(nPieces >= nToks && fert >= 1.0, s"doc $id fertility")
      assert(oovFrac >= 0.0 && oovFrac <= 1.0 && nOov <= nToks, s"doc $id oov")
      // the vocab contains every word of the half it trained on
      if (id < 250) assert(nOov == 0, s"doc $id: OOV inside the training half")
    }
    // the fixture's generator shares one word pool across halves, so the
    // OOV/fallback path is proven on a constructed corpus instead: the
    // vocab knows only "low" (as "lo w"); "unseen" falls back to its 6
    // characters and counts as OOV
    import spark.implicits._
    val vocab = Seq(("low", 1L, "lo w")).toDF("word", "wcount", "syms")
    val docs2 = Seq((1L, "low unseen")).toDF("id", "body")
    val st = graft.api.TrainingData.tokenizerStats(docs2, "id", "body", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(st.toSeq == Seq((1L, 2L, 8L, 1L, 4.0, 0.5)))
  }

  test("x26i cluster split: no near-dup pair straddles splits; all splits populated") {
    import org.apache.spark.sql.functions.col
    val split = DedupOps.x26iClusterSplit(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // THE invariant the op exists for: every near-dup pair lands in ONE
    // split (a doc-id split lets the model meet eval rows it memorized)
    val pairs = DedupOps.x26Jaccard(spark, d).select("d1", "d2").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(split(a) == split(b), s"pair ($a, $b) straddles ${split(a)}/${split(b)}")
    }
    // the 80/10/10 intent survives the cluster granularity (loose bound:
    // cluster sizes skew the per-doc fractions)
    val byS = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > byS("val") && byS("train") > byS("test"))
  }

  test("x50 dup matrix folds unordered source pairs and conserves the pair count") {
    import org.apache.spark.sql.functions.col
    val pairs = DedupOps.x26Jaccard(spark, d).select("d1", "d2").collect()
    val srcs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = pairs.map { r =>
      val (a, b) = (srcs(r.getLong(0)), srcs(r.getLong(1)))
      (Seq(a, b).min, Seq(a, b).max)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = DedupOps.x50DupMatrix(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    // conservation: every near-dup pair lands in exactly one matrix cell
    assert(got.values.sum == pairs.length && pairs.nonEmpty)
    got.keys.foreach { case (a, b) => assert(a <= b) }
  }

  test("x49 DSIR weights match a plain-Scala hashed-ngram model and separate domains") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // independent model of the whole pipeline: JVM sha256 bucket hash,
    // unigram+bigram features with multiplicity, add-one smoothing,
    // micro-nat lambda, exact integer per-doc sums
    def h16(s: String): Int = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(2).foldLeft(0)((a, b) => (a << 8) | (b & 0xff))
    def feats(text: String): Seq[String] = {
      val tk = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      tk ++ tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val B = 256
    val withB = docs.map { case (id, tx, lang) =>
      (id, lang == "en", feats(tx).map(f => h16(f) % B)) }
    val ct = Array.fill(B)(0L); val cr = Array.fill(B)(0L)
    withB.foreach { case (_, t, bs) =>
      bs.foreach(b => if (t) ct(b) += 1 else cr(b) += 1) }
    val (tt, tr) = (ct.sum, cr.sum)
    val lam = (0 until B).map(b => math.round(
      (math.log((ct(b) + 1).toDouble / (tt + B)) -
        math.log((cr(b) + 1).toDouble / (tr + B))) * 1e6))
    val expect = withB.filter(_._3.nonEmpty).map { case (id, _, bs) =>
      val s = bs.map(lam(_)).sum
      id -> ((bs.size.toLong,
        BigDecimal(s.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = SamplingOps.x49DsirWeights(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expect)
    // the model does what DSIR exists for: target-domain docs score
    // strictly higher on average than the rest of the corpus
    val bySide = withB.map { case (id, t, _) => t -> got.get(id) }
      .collect { case (t, Some((_, w))) => t -> w }
    val tgt = bySide.collect { case (true, w) => w }
    val rest = bySide.collect { case (false, w) => w }
    assert(tgt.nonEmpty && rest.nonEmpty)
    assert(tgt.sum / tgt.size > rest.sum / rest.size,
      s"no domain separation: en ${tgt.sum / tgt.size} vs ${rest.sum / rest.size}")
  }

  test("dsirWeights (xxhash64 default) agrees with the portable twin on structure") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val isT = col("lang") === "en"
    val pub = graft.api.TrainingData.dsirWeights(docs, "doc_id", "text", isT)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val port = graft.api.TrainingData
      .dsirWeightsPortable(docs, "doc_id", "text", isT)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // same scored doc set and identical per-doc n_feats: the bucket hash
    // (xxhash64 vs sha16) must not change WHICH features exist, only
    // where they land — a pmod/bucket-assignment bug shows up here
    assert(pub.keySet == port.keySet)
    pub.foreach { case (id, (n, _)) =>
      assert(n == port(id)._1, s"doc $id n_feats: public $n vs portable ${port(id)._1}")
    }
    // and the public path satisfies the same model invariant the x49
    // gate proves for the portable one: target docs outscore the rest
    val side = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), isT.as("t")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val tgt = pub.collect { case (id, (_, w)) if side(id) => w }
    val rest = pub.collect { case (id, (_, w)) if !side(id) => w }
    assert(tgt.nonEmpty && rest.nonEmpty)
    assert(tgt.sum / tgt.size > rest.sum / rest.size,
      s"no domain separation on the xxhash64 path")
  }

  test("packed int8 top-k recalls the float top-k (quantization error only)") {
    val brute = pairSet(VectorOps.x27TopK(spark, d).select("q_id", "c_id").collect())
    val packed = pairSet(VectorOps.x27dAnnPacked(spark, d).select("q_id", "c_id").collect())
    assert(packed.nonEmpty)
    val recall = (brute & packed).size.toDouble / brute.size
    assert(recall >= 0.8, s"packed-corpus recall $recall too low for int8 error")
    // packed sims are true cosines of the quantized vectors: within the
    // quantization error band of the float sims for overlapping pairs
    val fsims = VectorOps.x27TopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    VectorOps.x27dAnnPacked(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .filter { case (pair, _) => fsims.contains(pair) }
      .foreach { case (pair, s) =>
        assert(math.abs(s - fsims(pair)) < 0.05, s"pair $pair: $s vs ${fsims(pair)}")
      }
  }

  test("embedding LSH near-dup pairs are an exact-verified subset of the quadratic scan") {
    val exact = VectorOps.x26dEmbeddingNearDup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = VectorOps.x26fEmbeddingNearDupLsh(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty && lsh.nonEmpty)
    // no false positives, and identical sims (the verify step is exact)
    lsh.foreach { case (pair, sim) =>
      assert(exact.contains(pair), s"LSH emitted non-pair $pair")
      assert(exact(pair) == sim, s"pair $pair: lsh sim $sim vs exact ${exact(pair)}")
    }
    // recall floor: 8 tables x 4 bits at cos >= 0.4 collides with
    // p_table = (1 - arccos(0.4)/pi)^4 ~ 0.16 -> recall ~ 0.75 expected
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.4, s"embedding LSH recall $recall too low")
  }

  test("x67 winnowing pairs catch every shared >= w+k-1 token run on the fixture") {
    import org.apache.spark.sql.functions.col
    // THE winnowing guarantee (Schleimer et al. §3): any run of
    // window + k - 1 = 6 consecutive tokens shared by two documents
    // spans a full window on both sides, whose selected fingerprint is
    // identical — so every 6-gram-sharing pair MUST appear
    val toks = graft.Tables.t(spark, d, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toVector)
    val byGram = toks.flatMap { case (id, tk) =>
      if (tk.size < 6) Seq.empty
      else (0 to tk.size - 6).map(i => tk.slice(i, i + 6).mkString(" ") -> id)
    }.groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val guaranteed = byGram.filter(_.size > 1)
      .flatMap(g => g.combinations(2).map(p => (p(0), p(1)))).toSet
    val winnow = DedupOps.x67WinnowPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guaranteed.nonEmpty, "fixture has no shared 6-gram — test is vacuous")
    guaranteed.foreach(p => assert(winnow.contains(p), s"guaranteed pair $p missed"))
  }

  test("x68 spans sit inside their documents and re-verify against probe shingles") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .toMap
    def kgrams(t: String): Vector[String] = {
      val tk = t.toLowerCase.split(" ").filter(_.nonEmpty).toVector
      if (tk.size < 3) Vector.empty
      else (0 to tk.size - 3).map(i => tk.slice(i, i + 3).mkString(" ")).toVector
    }
    val probeSets = docs.collect { case (id, t) if id < 50 => id -> kgrams(t).toSet }
    val rows = DedupOps.x68ContamSpans(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, probe, s0, e0, n, spanToks) =>
      val kg = kgrams(docs(doc))
      assert(doc >= 50 && probe < 50)
      assert(s0 >= 1 && e0 <= kg.size && s0 <= e0)
      assert(n == e0 - s0 + 1 && spanToks == e0 - s0 + 3) // runs are contiguous
      // every kgram in the span is genuinely in the probe; the run is
      // MAXIMAL (the neighbours on both sides are not matches)
      val ps = probeSets(probe)
      (s0 to e0).foreach(p => assert(ps.contains(kg((p - 1).toInt)), s"($doc,$probe) pos $p"))
      if (s0 > 1) assert(!ps.contains(kg((s0 - 2).toInt)), s"($doc,$probe) not maximal left")
      if (e0 < kg.size) assert(!ps.contains(kg(e0.toInt)), s"($doc,$probe) not maximal right")
    }
  }

  test("x71 triangle census agrees with a Scala model of the shared pair graph") {
    val pairs = pairSet(DedupOps.x26Jaccard(spark, d).select("d1", "d2").collect())
    val got = DedupOps.x71DupTriangles(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    assert(got.keySet == adj.keySet) // every endpoint appears
    got.foreach { case (id, (deg, tri, cc)) =>
      assert(deg == adj(id).size.toLong, s"degree of $id")
      val nbrs = adj(id).toSeq
      val expTri = (for {
        i <- nbrs.indices; j <- (i + 1) until nbrs.size
        if adj(nbrs(i)).contains(nbrs(j))
      } yield 1).size.toLong
      assert(tri == expTri, s"triangles of $id")
      val expCc = if (deg >= 2)
        BigDecimal(2.0 * expTri / (deg * (deg - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(cc == expCc, s"clustering of $id")
    }
    // the fixture's exact-dup families are cliques: at least one node
    // must sit at clustering 1.0 for the diagnostic to mean anything
    assert(got.values.exists(v => v._1 >= 2 && v._3 == 1.0))
  }

  test("x72 pagerank replays the integer recurrence over the shared pair graph") {
    val pairs = pairSet(DedupOps.x26Jaccard(spark, d).select("d1", "d2").collect())
    val got = DedupOps.x72DupPagerank(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val edges = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = in.map { case (id, s) => id -> (150000L + 85L * s / 100L) }
    }
    assert(got.keySet == deg.keySet)
    got.foreach { case (id, (dg, rk)) =>
      assert(dg == deg(id) && rk == r(id), s"node $id: ($dg, $rk)")
    }
    // within a clique every member has the same rank (symmetric roles)
    assert(got.nonEmpty)
  }

  test("x73 hard negatives and the near-dup positives partition the sim axis") {
    val neg = VectorOps.x73HardNegatives(spark, d).collect()
    assert(neg.nonEmpty)
    assert(neg.forall(_.getDouble(2) < 0.4)) // strictly below the band edge
    // no (q, c) hard negative may appear in the x26d positive relation
    val pos = VectorOps.x26dEmbeddingNearDup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(neg.forall { r =>
      val (q, c) = (r.getLong(0), r.getLong(1))
      !pos.contains((math.min(q, c), math.max(q, c)))
    })
    // per query: ranks are 1..n with no gaps, sims non-increasing
    neg.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rows.length).toSeq, s"q=$q")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(2) >= b.getDouble(2)
        case _ => true
      }, s"q=$q sims")
    }
  }

  test("dedup clusters are the connected components of the near-dup pair graph") {
    val pairs = pairSet(DedupOps.x26Jaccard(spark, d).select("d1", "d2").collect())
    val labels = DedupOps.x26eDedupClusters(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc in a pair is labelled; both ends share a label; the label
    // is the min doc_id of the component (a reachable node)
    pairs.foreach { case (a, b) =>
      assert(labels.contains(a) && labels.contains(b))
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    assert(labels.keySet == pairs.flatMap(p => Seq(p._1, p._2)))
    labels.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keySet.min == label, s"cluster $label not labelled by its min member")
    }
  }

  test("int8 quantization stays in range with per-element error under scale/2") {
    val rows = VectorOps.x30cQuantize(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      Seq(2, 3, 4, 5).foreach(i => assert(math.abs(r.getInt(i)) <= 127))
      val mse = r.getDouble(7)
      // worst case per-element |err| = scale/2 ⇒ mse ≤ (scale/2)²
      assert(mse <= (scale / 2) * (scale / 2) + 1e-12,
        s"vec ${r.getLong(0)}: mse $mse vs scale $scale")
    }
  }

  test("centroid aggregator is partitioning-invariant (integer-space sums)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = VectorOps.x30Centroid(spark, d).collect().map(_.toSeq)
    // same aggregator over a deliberately different partitioning: partial
    // aggregation order changes, result must not
    val repart = graft.Tables.t(spark, d, "embeddings")
      .repartition(17)
      .select(col("label"), col("embedding")).as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .agg(VectorOps.CentroidAgg.toColumn.name("centroid"))
      .toDF("label", "centroid")
      .select(col("label"),
        element_at(col("centroid"), 1).as("c1"),
        element_at(col("centroid"), 2).as("c2"),
        element_at(col("centroid"), 3).as("c3"),
        element_at(col("centroid"), 4).as("c4"))
      .orderBy(col("label"))
      .collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(repart))
  }

  test("heavy-hitter sketch equals exact counting while the vocab fits the sketch") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, d, "documents")
    val sketch = graft.api.TrainingData.heavyHitters(docs, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = docs
      .select(explode(DedupOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the fixture vocabulary (~30 tokens) is far under maxItems, so the
    // DataSketches estimates are exact — but WHICH boundary-tied token
    // enters the top k is sketch-internal (the documented rows-only
    // reason), so compare estimates and the count profile, not identity
    val exactAll = docs
      .select(explode(DedupOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sketch.foreach { case (tok, est) =>
      assert(exactAll(tok) == est, s"$tok: sketch $est != exact ${exactAll(tok)}")
    }
    assert(sketch.map(_._2).toSeq == exact.map(_._2).toSeq,
      s"count profile differs: ${sketch.toSeq} vs ${exact.toSeq}")
  }

  test("approx percentiles sit within the sketch's rank-error bound of exact") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.t(spark, d, "lineitem")
      .select(col("l_returnflag").as("rf"),
        expr("CAST(round(l_extendedprice*100,0) AS BIGINT)").as("cents"))
    // independent check: compute the sketch answers directly and verify
    // the rank bound against a local sort (not the query's own counts)
    val approx = li.groupBy(col("rf")).agg(
        expr("approx_percentile(cents, 0.5, 10000)").as("m"),
        expr("approx_percentile(cents, 0.9, 10000)").as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val groups = li.collect().groupBy(_.getString(0))
    groups.foreach { case (rf, rows) =>
      val sorted = rows.map(_.getLong(1)).sorted
      val n = sorted.length
      // a duplicated value occupies the whole rank interval
      // [count(<v), count(<=v)] — the sketch answer is in-bound if that
      // interval OVERLAPS the tolerance band around the target rank
      def rankRange(v: Long): (Int, Int) =
        (sorted.count(_ < v), sorted.count(_ <= v))
      val (med, p90) = approx(rf)
      // accuracy 10000 ⇒ rank error ≤ ceil(n/10000); allow +1 for rounding
      val tol = n / 10000 + 2
      def inBound(r: (Int, Int), target: Double) =
        r._1 <= target + tol && r._2 >= target - tol
      assert(inBound(rankRange(med), 0.5 * n), s"$rf median rank off")
      assert(inBound(rankRange(p90), 0.9 * n), s"$rf p90 rank off")
    }
    // and the registered audit query reaches the same verdict in-plan
    val audit = Functions.q08dApproxPercentiles(spark, d).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} median_in_bound false")
      assert(r.getBoolean(3), s"${r.getString(0)} p90_in_bound false")
    }
  }

  test("bounded-memory quality cut lands within the sketch's rank error of the exact cut") {
    import org.apache.spark.sql.functions._
    // x31g (exact = false): the per-stratum threshold comes from
    // approx_percentile, a data VALUE at the target rank (±sketch error),
    // where the exact twin interpolates — so the kept sets can legally
    // differ by the rows between those two thresholds, and the bound to
    // assert is on RANKS, mirroring the q08d pattern
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = docs.groupBy(_._2)
    val approx = graft.api.TrainingData.topFractionByStrata(
        graft.Tables.t(spark, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "n_chars", 0.3, exact = false)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exactKept = SamplingOps.x31dQualityCut(spark, d).collect()
      .map(r => r.getLong(0)).toSet
    assert(approx.nonEmpty)
    // the registered audit query reaches the same verdicts in-plan
    val audit = SamplingOps.x31gQualityCutApprox(spark, d).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} threshold_in_bound false")
      assert(r.getBoolean(3), s"${r.getString(0)} clean_cut false")
    }
    byLang.foreach { case (lang, rows) =>
      val keptA = approx.filter(_._2 == lang)
      assert(keptA.nonEmpty, s"$lang: approx cut kept nothing")
      val tA = keptA.map(_._3).min
      // internal consistency: kept set IS the >= threshold filter
      assert(keptA.map(_._1).toSet == rows.filter(_._3 >= tA).map(_._1).toSet,
        s"$lang: approx kept set is not a clean threshold cut")
      // the effective threshold's rank interval overlaps the 0.7-quantile
      // target within the sketch tolerance (default accuracy 10000)
      val vals = rows.map(_._3).sorted
      val n = vals.length
      val target = 0.7 * n
      val tol = n / 10000 + 2
      assert(vals.count(_ < tA) <= target + tol &&
        vals.count(_ <= tA) >= target - tol,
        s"$lang: approx threshold $tA rank outside sketch bound")
    }
    // global deviation vs the exact twin: only boundary rows may differ
    val approxIds = approx.map(_._1).toSet
    val strata = byLang.size
    assert((approxIds diff exactKept).size + (exactKept diff approxIds).size
      <= strata * 3,
      s"approx vs exact kept sets differ beyond boundary rows")
  }

  // ---- plain-Scala IVF model (shared by the x40 and x27g tests) ----
  // independent reimplementation of the index build (seeds → 2
  // integer-space Lloyd iterations → final assignment) in driver-side
  // Scala, mirroring each float operation's fold order — the same role
  // the plain-Scala MinHash model plays for the native signature
  // expression
  private def dotM(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
  }
  private def cosM(a: Array[Float], b: Array[Float]): Double =
    dotM(a, b) / (math.sqrt(dotM(a, a)) * math.sqrt(dotM(b, b)))
  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r0(v: Double): Long =
    (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
  /** (id-sorted corpus, vec→cid assignment, final centroids). `keep`
    * restricts the corpus the index is BUILT on (x45 trains on the old
    * 80 % only). */
  private def ivfModel(keep: Long => Boolean = _ => true):
      (Array[(Long, Array[Float])], Map[Long, Int], Map[Int, Array[Float]]) = {
    val rows = graft.Tables.t(spark, d, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter { case (id, _) => keep(id) }.sortBy(_._1)
    // seeds: the 16 lowest-id vectors, relabelled 0..15
    var cents: Map[Int, Array[Float]] =
      rows.take(16).zipWithIndex.map { case ((_, e), i) => i -> e }.toMap
    // argmax cosine on the RAW double, ties → higher cid (max(struct))
    def assign(e: Array[Float]): Int =
      cents.toSeq.sortBy(_._1).foldLeft((-1, Double.NegativeInfinity)) {
        case ((bc, bs), (c, ce)) =>
          val s = cosM(e, ce); if (s >= bs) (c, s) else (bc, bs)
      }._1
    (1 to 2).foreach { _ =>
      val sums = scala.collection.mutable.Map[Int, Array[Long]]()
      val cnt = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
      rows.foreach { case (_, e) =>
        val c = assign(e)
        val acc = sums.getOrElseUpdate(c, Array.fill(64)(0L))
        var i = 0
        while (i < 64) { acc(i) += r0(e(i).toDouble * 1000000L); i += 1 }
        cnt(c) += 1
      }
      // empty clusters drop out of the centroid table, like groupByKey;
      // the mean is the integer-exact micro rounding finish() computes
      cents = sums.map { case (c, acc) =>
        val n = cnt(c)
        c -> acc.map { s =>
          val q = if (s >= 0) (2 * s + n) / (2 * n) else -((2 * -s + n) / (2 * n))
          (q.toDouble / 1000000.0).toFloat
        }
      }.toMap
    }
    (rows, rows.map { case (id, e) => id -> assign(e) }.toMap, cents)
  }

  test("x40 semantic dedup + cluster profile match a plain-Scala SemDeDup model") {
    val (rows, cid, cents) = ivfModel()
    def cos(a: Array[Float], b: Array[Float]): Double = cosM(a, b)
    val byCluster = rows.groupBy { case (id, _) => cid(id) }
    val expectRemoved = byCluster.values.flatMap { members =>
      members.flatMap { case (v2, e2) =>
        val sims = members.collect {
          case (v1, e1) if v1 < v2 => round6(cos(e1, e2))
        }.filter(_ >= 0.35)
        if (sims.isEmpty) None else Some(v2 -> (cid(v2), sims.max))
      }
    }.toMap
    val got = VectorOps.x40SemDedup(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    assert(got == expectRemoved)
    // profile: sizes partition the corpus, micro-mean and min id replay
    val expectProf = byCluster.map { case (c, members) =>
      val qs = members.map { case (_, e) => r0(round6(cos(e, cents(c))) * 1e6) }.sum
      c -> (members.size.toLong, qs / members.size, members.map(_._1).min)
    }
    val prof = VectorOps.x40bClusterProfile(spark, d).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof == expectProf)
    assert(prof.values.map(_._1).sum == rows.length)
  }

  test("x53 prototype prune matches the plain-Scala per-cluster distance ranking") {
    val (rows, cid, cents) = ivfModel()
    val got = VectorOps.x53PrototypePrune(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3), r.getBoolean(4)))).toMap
    val expect = rows.groupBy { case (id, _) => cid(id) }.toSeq.flatMap {
      case (c, mem) =>
        mem.toSeq.map { case (id, e) =>
          (id, math.round(round6(cosM(e, cents(c))) * 1e6)) }
          .sortBy { case (id, sm) => (sm, id) }
          .zipWithIndex
          .map { case ((id, sm), i) => id -> ((c, sm, i + 1, i + 1 <= 10)) }
    }.toMap
    assert(got == expect)
    // the prune keeps exactly min(10, cluster size) per cluster, rank 1 =
    // farthest from the prototype (lowest similarity)
    val kept = got.values.groupBy(_._1).map { case (c, vs) =>
      c -> vs.count(_._4) }
    val sizes = got.values.groupBy(_._1).map { case (c, vs) => c -> vs.size }
    kept.foreach { case (c, k) => assert(k == math.min(10, sizes(c))) }
  }

  test("x28s gopher rules match a plain-Scala model on the fixture docs") {
    val docs = graft.Tables.t(spark, d, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val stop = Set("the", "a", "and", "of", "to", "in")
    val expect = docs.map { case (id, text) =>
      val tk = text.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq
      val n = tk.length
      val mean = if (n > 0) Some(round6(tk.map(_.length.toLong).sum.toDouble / n)) else None
      val alpha = if (n > 0)
        Some(round6(tk.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / n)) else None
      val nStop = tk.distinct.count(stop)
      val rLen = n < 20 || n > 80
      val rWl = mean.forall(m => m < 4.0 || m > 5.0)
      val rAl = alpha.forall(_ < 0.8)
      val rSt = nStop < 2
      (id, n, mean, alpha, nStop, rLen, rWl, rAl, rSt,
        !(rLen || rWl || rAl || rSt))
    }.sortBy(_._1).toSeq
    val got = TextOps.x28sGopherRules(spark, d).collect().map { r =>
      (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getInt(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8), r.getBoolean(9))
    }.toSeq
    assert(got == expect)
    // the thresholds discriminate on this fixture: both verdicts occur
    assert(got.exists(_._10) && got.exists(!_._10))
  }

  test("x27g knn graph matches the plain-Scala per-cluster top-3 model") {
    val (rows, cid, _) = ivfModel()
    val byCluster = rows.groupBy { case (id, _) => cid(id) }
    val expect = byCluster.values.toSeq.flatMap { members =>
      members.toSeq.flatMap { case (v, e) =>
        members.toSeq
          .collect { case (n, ne) if n != v => (n, round6(cosM(e, ne))) }
          .sortBy { case (n, sim) => (-sim, n) }
          .take(3).zipWithIndex
          .map { case ((n, sim), i) => (v, n, cid(v), sim, i + 1) }
      }
    }.toSet
    val got = VectorOps.x27gKnnGraph(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
    // every vector in a ≥2-member cluster has at least one neighbor edge
    val covered = got.map(_._1)
    val expectCovered = byCluster.values.filter(_.length >= 2)
      .flatMap(_.map(_._1)).toSet
    assert(covered == expectCovered)
  }

  test("x45 ivf append matches a frozen-centroid plain-Scala model") {
    val (_, oldCid, cents) = ivfModel(keep = _ % 5 != 0)
    // argmax with the production tie rule (ties → higher cid)
    def assign(e: Array[Float]): Int =
      cents.toSeq.sortBy(_._1).foldLeft((-1, Double.NegativeInfinity)) {
        case ((bc, bs), (c, ce)) =>
          val s = cosM(e, ce); if (s >= bs) (c, s) else (bc, bs)
      }._1
    val newRows = graft.Tables.t(spark, d, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter(_._1 % 5 == 0)
    val expAsg = newRows.map { case (id, e) => id -> assign(e) }.toMap
    val expOld = oldCid.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val expNew = expAsg.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val got = VectorOps.x45IvfAppend(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.map(_._1).sameElements(newRows.map(_._1).sorted))
    got.foreach { case (id, cid, nOld, nNew) =>
      assert(cid == expAsg(id), s"vec $id cid")
      assert(nOld == expOld.getOrElse(cid, 0L), s"vec $id n_old")
      assert(nNew == expNew(cid), s"vec $id n_new")
    }
  }

  test("x44 curriculum buckets match exact quartile thresholds of the LM scores") {
    val scores = TextOps.x28nBigramLm(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Spark's exact percentile: linear interpolation at p·(n−1),
    // threshold compared UNROUNDED (see difficultyBuckets scaladoc)
    val sorted = scores.map(_._3).sorted
    def pct(p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      val g = pos - lo
      sorted(lo) + (sorted(hi) - sorted(lo)) * g
    }
    val (t1, t2, t3) = (pct(0.25), pct(0.5), pct(0.75))
    val expect = scores.map { case (id, nb, s) =>
      (id, nb, s, 1 + (if (s > t1) 1 else 0) + (if (s > t2) 1 else 0)
        + (if (s > t3) 1 else 0))
    }.sortBy(_._1).toSeq
    val got = TextOps.x44Curriculum(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expect)
    // quartiles are near-balanced (exact quarters up to threshold ties)
    val byBucket = got.groupBy(_._4).view.mapValues(_.size)
    assert(byBucket.keySet == Set(1, 2, 3, 4))
  }

  test("parametric semanticDedup partitions the corpus into kept + removed") {
    val e = graft.Tables.t(spark, d, "embeddings")
    val removed = graft.api.TrainingData
      .semanticDedupRemoved(e, "vec_id", "embedding", 0.35).collect()
      .map(_.getLong(0)).toSet
    val kept = graft.api.TrainingData
      .semanticDedup(e, "vec_id", "embedding", 0.35)
    assert(kept.columns.sameElements(e.columns)) // input schema preserved
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(removed.nonEmpty && (keptIds & removed).isEmpty)
    assert(keptIds.size + removed.size == e.count())
    // fixture binding agrees with the parametric build (same params)
    assert(removed == VectorOps.x40SemDedup(spark, d)
      .collect().map(_.getLong(0)).toSet)
  }

  test("count-min sketch never undercounts and respects its eps bound here") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, d, "documents")
    val eps = 1e-4 // passed explicitly so the asserted bound tracks the build
    val cms = graft.api.TrainingData.tokenCountSketch(docs, "text", eps = eps)
    val exact = docs
      .select(explode(DedupOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    val slack = (eps * cms.totalCount()).ceil.toLong
    exact.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"$tok undercounted: $est < $n")
      assert(est <= n + slack, s"$tok overcounted past the eps bound: $est > $n + $slack")
    }
    assert(cms.estimateCount("token-absent-from-corpus") <= slack)
  }

  test("blocked near-dup cap: oversized blocks go windowed, small blocks stay exact") {
    import spark.implicits._
    // ten keys in ONE block (shared 4-char prefix + length): suffix 00..09
    val rows = (0 to 9).map(i => (i.toLong, f"aaaa$i%02d00")).toDF("id", "k")
    // cap not binding → exact all-pairs: C(10,2) = 45 candidates
    val exact = DedupOps.typoNearDupPairs(rows, "id", "k",
      blockPrefix = 4, maxDist = 8).collect()
    assert(exact.length == 45)
    // cap 4 < block size 10 → sorted-neighborhood window 2:
    // 9 gap-1 + 8 gap-2 = 17 candidates, each sort-adjacent
    val windowed = DedupOps.typoNearDupPairs(rows, "id", "k",
      blockPrefix = 4, maxDist = 8, maxBlockSize = 4, window = 2)
      .collect()
    assert(windowed.length == 17)
    // the near-identical neighbor (sort-adjacent) pairs all survive
    val pairs = windowed.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 to 8).forall(i => pairs.contains((i.toLong, i + 1L))))
    // jw path shares the generator: same 17 candidates at threshold 0
    assert(DedupOps.jwNearDupPairs(rows, "id", "k", blockPrefix = 4,
      minJwMicros = 0L, maxBlockSize = 4, window = 2)
      .collect().length == 17)
  }

  test("canonicalUrl collapses case/port/slash/utm/fragment variants, preserves path case") {
    import spark.implicits._
    val urls = Seq(
      (1L, "http://a.com/p/"),
      (2L, "HTTP://A.com/p"),
      (3L, "http://a.com:80/p#x"),
      (4L, "http://a.com/p?utm_campaign=z"),
      (5L, "http://a.com/q"),                          // distinct path
      (6L, "http://a.com/p?utm_source=f&keep=1"),      // utm first, keep rest
      (7L, "http://b.com/Mixed/Case?id=1&utm_medium=m"), // utm mid-query
      // consecutive leading utm runs (the r14 ADVICE under-collapse: a
      // single global pass never rescans its own replacements, so the
      // &-rule must run before the leading rules)
      (8L, "http://a.com/p?utm_a=1&utm_b=2&keep=1"),
      (9L, "http://a.com/p?utm_a=1&utm_b=2&utm_c=3")
    ).toDF("id", "url")
    val got = DedupOps.urlDedup(urls, "id", "url").collect()
    val byCanon = got.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 1–4 and 9 collapse (9's three utm params all strip → bare /p):
    // five docs, five raw forms, min-id representative
    assert(byCanon("http://a.com/p") == (5L, 5L, 1L))
    assert(byCanon("http://a.com/q") == (1L, 1L, 5L))
    // non-utm query params survive; PATH case is preserved (RFC 3986 —
    // only scheme/host lowercase); 8's double-utm run fully strips
    assert(byCanon.contains("http://a.com/p?keep=1"))
    assert(byCanon.contains("http://b.com/Mixed/Case?id=1"))
    assert(byCanon("http://a.com/p?keep=1")._1 == 2L) // ids 6 and 8
    assert(got.length == 4)
  }

  test("x150b forced-oversized audit: windowed ⊆ exact, every block over cap") {
    val r = DedupOps.x150bWindowRecall(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    val (nBlocks, maxBlock, nOver) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (nExact, nWindowed) = (row.getLong(3), row.getLong(4))
    assert(nBlocks == 6 && maxBlock == 280 && nOver == nBlocks) // forced regime
    assert(nWindowed <= nExact && nWindowed > 0)
    val recall = row.getLong(5)
    assert(recall == nWindowed * 1000000L / nExact)
    assert(recall > 0 && recall < 1000000L) // the window measurably misses
  }

  test("x195 silhouette: bounded scores, consistent means, positive structure") {
    val rows = VectorOps.x195Silhouette(spark, d).collect()
    assert(rows.length == 16) // one row per IVF cluster
    val overall = rows.head.getLong(5)
    assert(rows.forall(_.getLong(5) == overall))
    rows.foreach { r =>
      val (a, b, sMean) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a >= 0 && b >= 0)
      assert(sMean >= -1000000L && sMean <= 1000000L)
      // separation beats cohesion on this fixture: real clusters
      assert(b > a)
    }
    assert(overall > 0)
    // n_vecs covers every clustered non-zero vector exactly once
    val n = rows.map(_.getLong(1)).sum
    assert(n == graft.Tables.t(spark, d, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id").isNotNull).count())
  }

  test("block-regime guard: x150/x174 fixtures raise once a block outgrows the cap") {
    import spark.implicits._
    // 10 keys in one (prefix, length) block; a cap of 4 is exceeded →
    // the guarded query path must RAISE, not silently switch regimes
    val rows = (0 to 9).map(i => (i.toLong, f"aaaa$i%02d00")).toDF("id", "k")
    val guardedOk = DedupOps.typoNearDupPairs(rows, "id", "k",
        blockPrefix = 4, maxDist = 8)
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        DedupOps.blockRegimeGuard(rows, "id", "k", 4, 16)))
      .filter(org.apache.spark.sql.functions.col("regime_ok") === 1)
    assert(guardedOk.count() == 45) // cap 16 ≥ 10: guard passes through
    val guardedBad = DedupOps.typoNearDupPairs(rows, "id", "k",
        blockPrefix = 4, maxDist = 8)
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        DedupOps.blockRegimeGuard(rows, "id", "k", 4, 4)))
      .filter(org.apache.spark.sql.functions.col("regime_ok") === 1)
    val e = intercept[Exception](guardedBad.count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("all-pairs regime")))
  }
}
