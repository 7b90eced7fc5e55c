package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

class SimilaritySpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("annIvf returns per-query top-k within the probed cell, cosines exact") {
    val ivf = Similarity.annIvf(spark, sf).collect()
    ivf should not be empty
    // ≤3 per query, ranks contiguous from 1
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      rows.length should be <= 3
      rows.map(_.getInt(rows.head.fieldIndex("rnk"))).sorted shouldBe (1 to rows.length)
    }
    // cosine values match an independent brute-force computation pair-by-pair
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), Similarity.norm2(col("embedding")).as("nrm"))
    val pairs = ivf.map(r => (r.getLong(0), r.getLong(r.fieldIndex("cand")))).toSet
    val brute = emb.as("a").crossJoin(emb.as("b"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("cand"),
        round(Similarity.dot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { r =>
      r.getDouble(r.fieldIndex("cos")) shouldBe brute((r.getLong(0),
        r.getLong(r.fieldIndex("cand"))))
    }
    pairs.size should be > 0
  }

  test("annLsh candidates always share the query's hyperplane bucket") {
    val rows = Similarity.annLsh(spark, sf).collect()
    rows should not be empty
    // bucket column is the join key — every row carries one bucket value
    rows.foreach(r => r.getInt(r.fieldIndex("bucket")) should (be >= 0 and be <= 15))
  }

  test("ivf is deterministic across runs (relational integer-grid quantizer)") {
    val a = Similarity.annIvf(spark, sf).collect().map(_.toString).toSeq
    val b = Similarity.annIvf(spark, sf).collect().map(_.toString).toSeq
    a shouldBe b
  }

  test("corpusClusters: every vector assigned exactly once to its argmin cluster") {
    import spark.implicits._
    val assign = Similarity.corpusClusters(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assign.length.toLong shouldBe n
    assign.map(_.getLong(0)).distinct.length.toLong shouldBe n
    // a Lloyd result uses more than one cluster on real data, and the
    // assignment is deterministic across runs
    assign.map(_.getInt(1)).distinct.length should be > 1
    val again = Similarity.corpusClusters(spark, sf).collect()
    again.map(_.toString).toSeq shouldBe assign.map(_.toString).toSeq
    graft.Caches.releaseAll(spark)
  }

  test("embedOutliers: flag rule matches an independent per-cluster mean; assignment preserved") {
    // factor=1.0 (above the cluster mean) so both flag values occur at
    // this tiny sf — the gated query's 2.0 tail is empty on 50 vectors
    val out = Similarity.embedOutliers(spark, sf, factor = 1.0).collect()
    graft.Caches.releaseAll(spark)
    val assign = Similarity.corpusClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    graft.Caches.releaseAll(spark)
    out.length shouldBe assign.size
    // per-cluster stats recomputed independently from the assignment
    val byCluster = assign.values.groupBy(_._1)
      .map { case (c, xs) => c -> (xs.size.toLong, xs.map(_._2).sum) }
    out.foreach { r =>
      val (vid, cluster, d) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assign(vid) shouldBe ((cluster, d))
      val (n, s) = byCluster(cluster)
      r.getLong(r.fieldIndex("n_c")) shouldBe n
      r.getLong(r.fieldIndex("sum_d")) shouldBe s
      r.getBoolean(r.fieldIndex("is_outlier")) shouldBe (d > 1.0 * s / n)
    }
    // the flag discriminates: both values occur
    val flagged = out.count(_.getBoolean(out.head.fieldIndex("is_outlier")))
    flagged should be > 0
    flagged should be < out.length
  }

  test("ivf recall@3 vs brute-force ground truth >= 0.8 (gate scale, nProbe=4)") {
    // s03's correctness signal beyond rows-only: join the declared IVF
    // output against the s01 brute-force gate output (the exact top-k).
    val sf01 = "/root/testdata/sf0.01"
    val truth = Similarity.annBruteForce(spark, sf01).collect()
      .filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.annIvf(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("cand")))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    recall should be >= 0.8
  }

  test("s28: ivf recall curve is monotone, saturates at nprobe = k, and " +
    "its nProbe=4 point is consistent with the s03 recall floor") {
    val sf01 = "/root/testdata/sf0.01"
    val got = Similarity.ivfRecallCurve(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    got.map(_._1).toSeq shouldBe (1 to 8)
    // n_pairs is the same truth-pair base in every row
    got.map(_._2).toSet.size shouldBe 1
    val nPairs = got.head._2
    nPairs shouldBe 8L * 3L // 8 queries x top-3 truth
    // monotone capture: probing more cells never loses a pair
    got.map(_._3).zip(got.map(_._3).drop(1)).foreach { case (a, b) =>
      a should be <= b
    }
    // every candidate lives in SOME cell, so the full budget catches all
    got.last._3 shouldBe nPairs
    // the documented s03 operating point (nProbe=4) clears its floor
    val at4 = got.find(_._1 == 4).get
    at4._3.toDouble / at4._2 should be >= 0.8
    graft.Caches.releaseAll(spark)
  }

  test("annRecall equals the per-query recompute from the s01/s02 frames") {
    val sf01 = "/root/testdata/sf0.01"
    val got = Similarity.annRecall(spark, sf01).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val truth = Similarity.annBruteForce(spark, sf01).collect()
      .filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1)))
    val approx = Similarity.annLsh(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("cand")))).toSet
    graft.Caches.releaseAll(spark)
    val byQ = truth.groupBy(_._1)
    got.keySet shouldBe byQ.keySet
    byQ.foreach { case (qid, pairs) =>
      val hits = pairs.count(approx)
      val (nTruth, nHits, recall) = got(qid)
      withClue(s"qid $qid: ") {
        nTruth shouldBe pairs.length.toLong
        nHits shouldBe hits.toLong
        recall shouldBe BigDecimal(hits.toDouble / pairs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        recall should (be >= 0.0 and be <= 1.0)
      }
    }
  }

  test("multiprobe dominates single-bucket LSH rank-wise and in recall") {
    val sf01 = "/root/testdata/sf0.01"
    // rank-wise dominance: retrieving a superset of candidates can only
    // raise (or keep) the cosine at every rank of the re-ranked top-k
    def byRank(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(r.fieldIndex("qid")),
        r.getInt(r.fieldIndex("rnk"))) ->
        r.getDouble(r.fieldIndex("cos"))).toMap
    val single = byRank(Similarity.annLsh(spark, sf01).collect())
    val multi = byRank(Similarity.annMultiProbe(spark, sf01).collect())
    single.foreach { case (key, cosSingle) =>
      withClue(s"query/rank $key: ") {
        multi(key) should be >= cosSingle
      }
    }
    // and recall@3 vs the exact brute-force truth never drops
    val truth = Similarity.annBruteForce(spark, sf01).collect()
      .filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]) =
      truth.intersect(rows.map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("cand")))).toSet).size.toDouble / truth.size
    val rMulti = recall(Similarity.annMultiProbe(spark, sf01).collect())
    val rSingle = recall(Similarity.annLsh(spark, sf01).collect())
    rMulti should be >= rSingle
  }

  test("matryoshka re-rank cosines are the exact full-dim values") {
    val sf01 = "/root/testdata/sf0.01"
    // the re-rank stage must reproduce the brute-force cosine exactly
    // for every (query, candidate) it retrieves — truncation may lose
    // candidates (that's the recall trade), it must never distort scores
    val exact = Similarity.annBruteForce(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = Similarity.annMatryoshka(spark, sf01).collect()
    rows should not be empty
    rows.groupBy(_.getLong(0)).values.foreach(_.length should be <= 3)
    rows.foreach { r =>
      val key = (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("cand")))
      exact.get(key).foreach { c =>
        withClue(s"pair $key: ") {
          r.getDouble(r.fieldIndex("cos")) shouldBe c
        }
      }
    }
  }

  test("pq recall@3 vs brute-force ground truth >= 0.875 (trained books, shortlist=16)") {
    val sf01 = "/root/testdata/sf0.01"
    val truth = Similarity.annBruteForce(spark, sf01).collect()
      .filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.annPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("cand")))).toSet
    graft.Caches.releaseAll(spark)
    // r6's seeded-codebook floor was 0.875 @ shortlist=12; the r7
    // trained codebooks + the standard ADC shortlist knob (12 → 16)
    // measure 0.917 here — the spec pins hold-or-improve vs r6
    val recall = truth.intersect(got).size.toDouble / truth.size
    recall should be >= 0.875
  }

  test("pq re-rank cosines are the exact full-dim values (ADC only shortlists)") {
    val sf01 = "/root/testdata/sf0.01"
    // ADC approximation may LOSE candidates (the recall trade); the
    // shortlist re-rank must never distort the scores of the survivors
    val exact = Similarity.annBruteForce(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = Similarity.annPq(spark, sf01).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    rows.groupBy(_.getLong(0)).values.foreach(_.length should be <= 3)
    rows.foreach { r =>
      val key = (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("cand")))
      exact.get(key).foreach { c =>
        withClue(s"pair $key: ") {
          r.getDouble(r.fieldIndex("cos")) shouldBe c
        }
      }
    }
  }

  test("ivfpq with nProbe=k degenerates to annPq exactly (routing only filters)") {
    // probing every cell makes the cell filter a no-op; the codebooks
    // train on the same candidate set, so every ADC score, shortlist,
    // and re-rank row must be IDENTICAL to annPq's — proving the IVF
    // stage is purely a candidate filter, never a scoring change
    val all = Similarity.annIvfPq(spark, sf, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    val pq = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    graft.Caches.releaseAll(spark)
    all should not be empty
    all.toSeq shouldBe pq.toSeq
  }

  test("ivfpq candidates are a subset of the IVF probe set; recall measured") {
    val sf01 = "/root/testdata/sf0.01"
    // annIvf with an unbounded topK returns EVERY candidate in a
    // probed cell (same coarse quantizer, same nProbe) — s15's pairs
    // must come from that universe
    val ivfAll = Similarity.annIvf(spark, sf01, topK = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.annIvfPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("cand"))))
    got should not be empty
    got.foreach { p => withClue(s"pair $p: ") { ivfAll should contain(p) } }
    // recall@3 vs brute force: the combined index loses candidates to
    // BOTH stages (unprobed cells + ADC shortlist misses)
    val truth = Similarity.annBruteForce(spark, sf01).collect()
      .filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll(spark)
    val recall = truth.intersect(got.toSet).size.toDouble / truth.size
    recall should be >= 0.7
  }

  test("residual ivfpq: same probe universe, exact re-rank cosines, recall holds") {
    val sf01 = "/root/testdata/sf0.01"
    // the residual variant changes SCORING only — candidates still
    // come from the same probed cells
    val ivfAll = Similarity.annIvf(spark, sf01, topK = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.annIvfPq(spark, sf01, residual = true).collect()
    rows should not be empty
    rows.foreach { r =>
      val p = (r.getLong(0), r.getLong(r.fieldIndex("cand")))
      withClue(s"pair $p: ") { ivfAll should contain(p) }
    }
    // survivors' cosines are the exact brute-force values (ADC only
    // shortlists; the re-rank must never distort)
    val exact = Similarity.annBruteForce(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(r.fieldIndex("cand")))
      exact.get(key).foreach { c =>
        withClue(s"pair $key: ") {
          r.getDouble(r.fieldIndex("cos")) shouldBe c
        }
      }
    }
    // recall@3: residual codebooks spend their resolution on
    // within-cell structure — must hold the non-residual floor
    val truth = Similarity.annBruteForce(spark, sf01).collect()
      .filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll(spark)
    val got = rows.map(r => (r.getLong(0), r.getLong(r.fieldIndex("cand")))).toSet
    truth.intersect(got).size.toDouble / truth.size should be >= 0.7
  }

  test("knnGraph: within-cell top-k for EVERY populated vector, exact cosines") {
    val rows = Similarity.knnGraph(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val cells = Similarity.corpusClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    graft.Caches.releaseAll(spark)
    // every edge stays inside the src's cell and dst shares it
    rows.foreach { r =>
      withClue(s"edge ${r.getLong(0)}->${r.getLong(1)}: ") {
        r.getInt(2) shouldBe cells(r.getLong(0))
        cells(r.getLong(1)) shouldBe cells(r.getLong(0))
      }
    }
    // per-src ranks contiguous from 1, at most kNeighbors
    rows.groupBy(_.getLong(0)).values.foreach { es =>
      es.length should be <= 3
      es.map(_.getInt(4)).sorted.toSeq shouldBe (1 to es.length)
    }
    // the graph covers the corpus: every vector whose cell has >= 2
    // members appears as a src (no silent drops)
    val pops = cells.values.groupBy(identity).map { case (c, o) => c -> o.size }
    rows.map(_.getLong(0)).toSet shouldBe
      cells.filter { case (_, c) => pops(c) >= 2 }.keySet
    // cosines are the exact brute-force values pair-by-pair
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"))
    val brute = emb.as("a").crossJoin(emb.as("b"))
      .select(col("a.vec_id").as("s"), col("b.vec_id").as("d"),
        round(Similarity.dot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      r.getDouble(3) shouldBe brute((r.getLong(0), r.getLong(1)))
    }
  }

  test("annBeam: exact cosines, contiguous ranks, recall@3 >= 0.8 vs full-corpus truth") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Similarity.annBeam(spark, sf01).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // structural: no self-results, contiguous per-query ranks from 1
    rows.foreach(r => r.getLong(1) should not be r.getLong(0))
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      rs.length should be <= 5
      rs.map(_.getInt(3)).sorted.toSeq shouldBe (1 to rs.length)
    }
    // the beam search corpus is ALL vectors (the s16 graph), so truth
    // is the full-corpus brute force — queries excluded as candidates
    // of themselves only
    val emb = Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        round(Similarity.dot(col("q_emb"), col("embedding")) /
          sqrt(col("q_nrm") * col("nrm")), 6).as("cos"))
      .collect()
    // every returned cosine is the exact brute-force value — the
    // approximation is WHICH vertices get visited, never their score
    val bruteCos = scored.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      withClue(s"(${r.getLong(0)},${r.getLong(1)}): ") {
        r.getDouble(2) shouldBe bruteCos((r.getLong(0), r.getLong(1)))
      }
    }
    // recall@3: graph traversal from 2 entry cells, beam 4, 2 hops
    val truth = scored.groupBy(_.getLong(0)).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(3)
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toSet
    val got = rows.filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    withClue(s"recall@3 = $recall: ") { recall should be >= 0.8 }
  }

  test("annMmr: equals an independent greedy MMR recompute; diversifies vs pure top-k") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Similarity.annMmr(spark, sf01).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // picks contiguous 1..5 per query
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      rs.map(_.getInt(4)).sorted.toSeq shouldBe (1 to 5)
    }
    // independent reference: rebuild the pool + pairwise sims with
    // plain DataFrame scoring, then run the textbook greedy loop in
    // driver-side Scala and compare pick-for-pick
    val emb = Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"))
    def grid(a: org.apache.spark.sql.Column) = round(a * 1e6, 0).cast("bigint")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val c = emb.filter(col("vec_id") % 20 === 0)
    val rel = c.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        grid(Similarity.dot(col("q_emb"), col("embedding")) /
          sqrt(col("q_nrm") * col("nrm"))).as("rel6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sim = c.as("a").crossJoin(c.as("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("ca"), col("b.vec_id").as("cb"),
        grid(Similarity.dot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nrm") * col("b.nrm"))).as("sim6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val qids = rel.keys.map(_._1).toSeq.distinct.sorted
    val expected = qids.flatMap { qid =>
      val pool = rel.collect { case ((`qid`, cand), r6) => (cand, r6) }.toSeq
        .sortBy { case (cand, r6) => (-r6, cand) }.take(10)
      var sel = Vector.empty[(Long, Long, Long, Int)] // cand, rel6, mmr6, pick
      for (i <- 1 to 5) {
        val remaining = pool.filterNot { case (cand, _) => sel.exists(_._1 == cand) }
        val scored = remaining.map { case (cand, r6) =>
          val pen = if (sel.isEmpty) 0L
            else sel.map(s => sim((cand, s._1))).max
          (cand, r6, 1L * r6 - 1L * pen)
        }
        val (cand, r6, m6) = scored.minBy { case (cand, _, m6) => (-m6, cand) }
        sel :+= ((cand, r6, m6, i))
      }
      sel.map { case (cand, r6, m6, pick) => (qid, cand, r6, m6, pick) }
    }.toSet
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getInt(4))).toSet shouldBe expected
    // MMR earns its keep: for at least one query the diversified set
    // differs from the pure relevance top-5 (otherwise the penalty
    // term never fired on this corpus and the test proves nothing)
    val pure = qids.flatMap { qid =>
      rel.collect { case ((`qid`, cand), r6) => (cand, r6) }.toSeq
        .sortBy { case (cand, r6) => (-r6, cand) }.take(5)
        .map { case (cand, _) => (qid, cand) }
    }.toSet
    val mmrSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    withClue("MMR picked exactly the pure top-5 everywhere: ") {
      mmrSet should not equal pure
    }
  }

  test("annFiltered: label invariant, contiguous ranks, equals the interpreted-fold reference") {
    val rows = Similarity.annFiltered(spark, sf).collect()
    rows should not be empty
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every result candidate shares its query's label (the filter is
    // part of the search, not a post-filter), and the reported label
    // column IS the query's label
    rows.foreach { r =>
      val (qid, lab, cand) = (r.getLong(0), r.getInt(1), r.getLong(2))
      lab shouldBe labels(qid)
      labels(cand) shouldBe labels(qid)
    }
    // ranks are contiguous from 1 per query
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getInt(4)).sorted.toSeq shouldBe (1 to g.length)
    }
    // full recompute via the interpreted fold reference (independent of
    // the codegen'd dot/norm expressions): same pairs, cosines, ranks
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        Similarity.norm2Fold(col("embedding")).as("q_nrm"), col("label").as("q_label"))
    val c = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2Fold(col("embedding")).as("nrm"), col("label"))
    val ref = c.crossJoin(q)
      .filter(col("label") === col("q_label") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        round(Similarity.dotFold(col("q_emb"), col("embedding")) /
          sqrt(col("q_nrm") * col("nrm")), 6).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand"))).cast("int"))
      .filter(col("rnk") <= 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    rows.map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getInt(4))).toSet shouldBe ref
  }

  test("hardNegatives: inverted label invariant, disjoint from s14, " +
      "equals the interpreted-fold reference") {
    val rows = Similarity.hardNegatives(spark, sf).collect()
    rows should not be empty
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every mined negative has a label DIFFERENT from its query's, and
    // the reported label column is the CANDIDATE's
    rows.foreach { r =>
      val (qid, cand, lab) = (r.getLong(0), r.getLong(2), r.getInt(3))
      lab shouldBe labels(cand)
      labels(cand) should not be labels(qid)
    }
    // ranks contiguous from 1 per query
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getInt(1)).sorted.toSeq shouldBe (1 to g.length)
    }
    // positives (s14) and negatives (s40) partition the candidate
    // space: no (qid, cand) appears in both
    val pos = Similarity.annFiltered(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val neg = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    pos.intersect(neg) shouldBe empty
    // full recompute via the interpreted fold reference
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        Similarity.norm2Fold(col("embedding")).as("q_nrm"),
        col("label").as("q_label"))
    val c = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2Fold(col("embedding")).as("nrm"), col("label"))
    val ref = c.crossJoin(q)
      .filter(col("label") =!= col("q_label") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        round(Similarity.dotFold(col("q_emb"), col("embedding")) /
          sqrt(col("q_nrm") * col("nrm")), 6).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand"))).cast("int"))
      .filter(col("rnk") <= 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    rows.map(r => (r.getLong(0), r.getLong(2), r.getDouble(4), r.getInt(1))).toSet shouldBe ref
  }

  test("rocchioExpand: two-round integer recompute; expansion moves the ranking") {
    val rows = Similarity.rocchioExpand(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // driver recompute on the same 1e-6 integer grid
    val embs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 8 || col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toArray)
      .toMap
    val cands = embs.keys.filter(_ % 20 == 0).toSeq.sorted
    val qids = embs.keys.filter(_ < 8).toSeq.sorted
    def n2(v: Array[Long]): Long = v.map(x => x * x).sum
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      BigDecimal(dp / math.sqrt(n2(a).toDouble * n2(b).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def top(qid: Long, qv: Array[Long], k: Int): Seq[(Long, Double)] =
      cands.filter(_ != qid).map(c => (c, cos(qv, embs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(k)
    val exp = qids.flatMap { qid =>
      val t3 = top(qid, embs(qid), 3).map(_._1)
      val qe = embs(qid).indices.map { i =>
        6L * embs(qid)(i) + t3.map(c => embs(c)(i)).sum
      }.toArray
      top(qid, qe, 5).zipWithIndex.map { case ((c, s), i) =>
        (qid, i + 1, c, s)
      }
    }.toSet
    rows.toSet shouldBe exp
    // the feedback loop genuinely moves something: for at least one
    // query the expanded top-5 differs from the unexpanded top-5
    val unexp = qids.flatMap { qid =>
      top(qid, embs(qid), 5).zipWithIndex.map { case ((c, _), i) =>
        (qid, i + 1, c)
      }
    }.toSet
    rows.map(r => (r._1, r._2, r._3)).toSet should not equal unexp
  }

  test("annBinary: packed words match a driver recompute; hamming exact; recall measured") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Similarity.annBinary(spark, sf01).collect()
    rows should not be empty
    // independent driver-side recompute of the sign-bit pack + Hamming
    // for every (qid, cand) the operator emitted
    val embs = Tables.embeddings(spark, sf01)
      .filter(col("vec_id") < 8 || col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def pack(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) if (v(i) > 0f) lo |= 1L << i
      for (i <- 32 until 64) if (v(i) > 0f) hi |= 1L << (i - 32)
      (lo, hi)
    }
    rows.foreach { r =>
      val (qid, cand, ham) = (r.getLong(0), r.getLong(1), r.getInt(2))
      val (ql, qh) = pack(embs(qid)); val (cl, ch) = pack(embs(cand))
      ham shouldBe java.lang.Long.bitCount(ql ^ cl) + java.lang.Long.bitCount(qh ^ ch)
    }
    // exact re-rank: cosines equal the brute-force gate's for shared pairs
    val bruteRows = Similarity.annBruteForce(spark, sf01).collect()
    val brute = bruteRows
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .foreach(_ shouldBe r.getDouble(3))
    }
    // ranks contiguous per query
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getInt(4)).sorted.toSeq shouldBe (1 to g.length)
    }
    // recall@3 vs exact truth — 1 bit/dim keeps the needle most of the
    // time on this corpus; floor pinned below the measured value
    val truth = bruteRows.filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    withClue(s"recall@3 = $recall: ") { recall should be >= 0.5 }
  }

  test("pageRank: fixed-point rounds match a driver BigInt replay over the gated edges") {
    val sf01 = "/root/testdata/sf0.01"
    val pr = Similarity.pageRank(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.releaseAll(spark)
    // the s16 gated query IS the edge set (rnk <= 3)
    val edges = Similarity.knnGraph(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.Caches.releaseAll(spark)
    val ids = graft.Tables.embeddings(spark, sf01)
      .select(org.apache.spark.sql.functions.col("vec_id"))
      .collect().map(_.getLong(0))
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var rank = ids.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d) => in(d) += rank(s) / outdeg(s) }
      rank = ids.map(v => v -> (150000L + 85L * in(v) / 100L)).toMap
    }
    pr shouldBe rank
    // damping floor: nobody falls below the teleport mass
    pr.values.foreach(_ should be >= 150000L)
  }

  test("kCenter: greedy farthest-point sequence matches a driver replay; max-min non-increasing") {
    val sf01 = "/root/testdata/sf0.01"
    val picks = Similarity.kCenter(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    graft.Caches.releaseAll(spark)
    picks.map(_._1).toSeq shouldBe (1 to 5)
    val pts = graft.Tables.embeddings(spark, sf01)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray
        .map(x => math.round(x.toDouble * 1e6)))
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var sel = Vector(pts.keys.min)
    var expect = Vector((1, pts.keys.min, 0L))
    for (i <- 2 to 5) {
      val cand = pts.keys.filterNot(sel.contains).map { v =>
        v -> sel.map(s => d2(pts(v), pts(s))).min
      }
      val (bv, bd) = cand.maxBy { case (v, d) => (d, -v) }
      sel = sel :+ bv
      expect = expect :+ ((i, bv, bd))
    }
    picks.toSeq shouldBe expect
    // the greedy max-min radius never increases as centers are added
    val minds = picks.drop(1).map(_._3)
    minds.zip(minds.drop(1)).foreach { case (a, b) => b should be <= a }
  }

  test("s27: kNN-vote predictions match a sequential neighbor-vote recompute; " +
    "k = 1 degenerates to the nearest neighbor's label") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), Similarity.norm2(col("embedding")).as("nrm"))
    // engine-rounded cosines (the same 6-decimal grid the operator ranks
    // on), so the driver replay selects the identical neighbor sets
    val cosMap = emb.as("a").filter(col("a.vec_id") < 8)
      .crossJoin(emb.as("b").filter(col("b.vec_id") % 20 === 0))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("cand"),
        round(Similarity.dot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def replay(k: Int): Seq[(Long, Int, Int, Int)] =
      cosMap.keys.map(_._1).toSeq.distinct.sorted.map { qid =>
        val nb = cosMap.collect { case ((q, c), cos) if q == qid => (c, cos) }
          .toSeq.sortBy { case (c, cos) => (-cos, c) }.take(k)
        val votes = nb.groupBy(p => labels(p._1)).view.mapValues(_.size)
        val (pred, v) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
        (qid, labels(qid), pred, v)
      }
    val got = Similarity.knnClassify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    got shouldBe replay(5)
    // every query gets exactly one decision, votes within [1, k]
    got.map(_._1).distinct.size shouldBe got.size
    all(got.map(_._4)) should (be >= 1 and be <= 5)
    // the k parameter is live: k = 1 is the pure nearest-neighbor rule
    val got1 = Similarity.knnClassify(spark, sf, k = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    got1 shouldBe replay(1)
    all(got1.map(_._4)) shouldBe 1
  }

  test("s29: BFS hop distances match an independent sequential BFS over " +
      "the collected edge list; both settled and unreached nodes occur") {
    val edges = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("src")), r.getLong(r.fieldIndex("dst"))))
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val hops = 4
    // sequential BFS from seeds {0, 1}, truncated at `hops`
    var dist = Map(0L -> 0, 1L -> 0)
    var frontier = Set(0L, 1L)
    for (h <- 1 to hops) {
      val next = frontier.flatMap(s => adj.getOrElse(s, Set.empty))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    val got = Similarity.bfsHops(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got shouldBe dist
    // non-vacuous both ways: some node is genuinely reached at hop >= 2
    // (propagation beyond the seeds' own lists) and some node stays
    // unreached (the output is a reachable set, not the corpus)
    got.values.max should be >= 2
    val corpus = Tables.embeddings(spark, sf).count()
    got.size.toLong should be < corpus
  }

  test("s30: reciprocal ranks match a recompute from the s01/s02 frames; " +
      "hits and misses both occur") {
    val truth = Similarity.annBruteForce(spark, sf).collect()
      .filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val method = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(r.fieldIndex("rnk")))
      .toMap
    val got = Similarity.annMrr(spark, sf).collect()
    got.map(_.getLong(0)).toSet shouldBe truth.keySet
    for (r <- got) {
      val (qid, tc) = (r.getLong(0), r.getLong(1))
      tc shouldBe truth(qid)
      method.get((qid, tc)) match {
        case Some(rk) =>
          r.getInt(r.fieldIndex("method_rank")) shouldBe rk
          r.getLong(r.fieldIndex("rr_ppm")) shouldBe 1000000L / rk
        case None =>
          r.isNullAt(r.fieldIndex("method_rank")) shouldBe true
          r.getLong(r.fieldIndex("rr_ppm")) shouldBe 0L
      }
    }
    // the metric discriminates: at least one hit and one miss
    got.count(_.getLong(3) > 0) should be > 0
    got.count(_.getLong(3) == 0) should be > 0
  }

  test("s31: refresh makes new vectors searchable and can only improve " +
      "per-rank scores vs the stale index") {
    val merged = Similarity.annIvfRefresh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3),
        r.getDouble(4), r.getInt(5)))
    merged should not be empty
    // freshness is live: some result row IS a new-batch vector
    merged.count(_._3) should be > 0
    // and the flag is truthful
    for ((_, cand, isNew, _, _) <- merged)
      isNew shouldBe (cand % 20 == 10)
    // vs the stale (base-only) index: at every (query, rank), the
    // merged index's cosine is >= the stale one's — extra candidates
    // can only improve a top-k
    val stale = Similarity.annIvf(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(r.fieldIndex("rnk"))),
        r.getDouble(r.fieldIndex("cos")))).toMap
    for ((qid, _, _, cos, rnk) <- merged; sc <- stale.get((qid, rnk)))
      withClue(s"query $qid rank $rnk: ") { cos should be >= sc }
  }

  test("s32: drift frame is internally consistent and the new batch " +
      "genuinely moves shares") {
    import org.apache.spark.sql.functions.col
    val rows = Similarity.cellDrift(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    rows should not be empty
    val nBase = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 20 === 0).count()
    val nFresh = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 20 === 10).count()
    rows.map(_._2).sum shouldBe nBase
    rows.map(_._3).sum shouldBe nBase + nFresh
    // floor-ppm shares sum to 10^6 less at most k floor losses
    for (shares <- Seq(rows.map(_._4), rows.map(_._5))) {
      shares.sum should be <= 1000000L
      shares.sum should be > 1000000L - rows.length
    }
    for ((cell, _, _, sb, sa, drift, alert) <- rows) withClue(s"cell $cell: ") {
      drift shouldBe math.abs(sa - sb)
      alert shouldBe (if (drift > 20000L) 1 else 0)
    }
    // the monitor isn't vacuous: the fresh batch moves some share
    rows.map(_._6).max should be > 0L
  }

  test("lshBucket planes/dims are parameterized (more planes → finer buckets)") {
    val emb = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"),
        Similarity.lshBucket(col("embedding")).as("b4"),
        Similarity.lshBucket(col("embedding"), planes = 6, dims = 64).as("b6"))
      .collect()
    emb.foreach { r =>
      r.getInt(1) should (be >= 0 and be <= 15)
      r.getInt(2) should (be >= 0 and be <= 63)
      // the first 4 sign bits are shared between the two widths
      (r.getInt(2) & 15) shouldBe r.getInt(1)
    }
  }

  test("silhouette: agrees with corpusClusters, margin law, ppm recompute") {
    val sil = Similarity.silhouette(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    val assign = Similarity.corpusClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    graft.Caches.releaseAll(spark)
    sil.length shouldBe assign.size
    sil.foreach { r =>
      val id = r.getLong(0)
      val (a2, b2) = (r.getLong(2), r.getLong(3))
      withClue(s"vec $id: ") {
        // same training → same cluster AND same own-centroid distance
        r.getInt(1) shouldBe assign(id)._1
        a2 shouldBe assign(id)._2
        // nearest-centroid assignment makes a the minimum: a2 ≤ b2,
        // so the margin lives in [0, 1e6] and recomputes exactly
        a2 should be <= b2
        val expect = if (math.max(a2, b2) == 0) 0L
          else (b2 - a2) * 1000000L / math.max(a2, b2)
        r.getLong(4) shouldBe expect
        r.getLong(4) should (be >= 0L and be <= 1000000L)
      }
    }
    // non-vacuous: real data separates unevenly
    sil.map(_.getLong(4)).distinct.length should be > 1
  }

  test("annRpTree: driver replay of the tree, balanced leaves, recall") {
    import spark.implicits._
    val sfb = "/root/testdata/sf0.01"
    val out = Similarity.annRpTree(spark, sfb).collect()
    graft.Caches.releaseAll(spark)
    out should not be empty
    // independent tree replay from raw embeddings
    val embs = Tables.embeddings(spark, sfb)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.round(x.toDouble * 1e6)).toArray).toMap
    def dt(l: Int, v: Array[Long]): Long =
      v.zipWithIndex.map { case (x, k) =>
        x * (((17 * (10 + l) + 31 * k + 5) % 7) - 3)
      }.sum
    val cands = embs.keys.filter(_ % 20 == 0).toSeq.sorted
    var nodes = Map(0 -> cands)
    val thresholds = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (l <- 0 until 3) {
      nodes = nodes.flatMap { case (node, vs) =>
        val scored = vs.map(v => (dt(l, embs(v)), v)).sorted
        val t = scored((scored.length + 1) / 2 - 1)._1
        thresholds((l, node)) = t
        val (left, right) = scored.partition(_._1 <= t)
        // balance law: with distinct projections the split is the
        // lower median — sibling sizes differ by at most 1
        if (scored.map(_._1).distinct.length == scored.length)
          math.abs(left.length - right.length) should be <= 1
        Map(node * 2 -> left.map(_._2), node * 2 + 1 -> right.map(_._2))
      }
    }
    val leafOf = nodes.flatMap { case (leaf, vs) => vs.map(_ -> leaf) }
    def qLeaf(q: Long): Int = {
      var node = 0
      for (l <- 0 until 3)
        node = node * 2 + (if (dt(l, embs(q)) > thresholds((l, node))) 1 else 0)
      node
    }
    out.foreach { r =>
      val (qid, cand, leaf) = (r.getLong(0), r.getLong(1), r.getInt(2))
      withClue(s"($qid,$cand): ") {
        leafOf(cand) shouldBe leaf
        qLeaf(qid) shouldBe leaf
      }
    }
    // ranked per query, and the index genuinely retrieves: some query
    // finds a top-3 brute-force neighbor inside its leaf
    val brute = Similarity.annBruteForce(spark, sfb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll(spark)
    out.map(r => (r.getLong(0), r.getLong(1))).count(brute) should be > 0
  }

  test("annRpForest: candidate union across trees — recall dominates the " +
      "single tree, tree-vote diagnostic non-vacuous") {
    val sfb = "/root/testdata/sf0.01"
    val forest = Similarity.annRpForest(spark, sfb).collect()
    graft.Caches.releaseAll(spark)
    val single = Similarity.annRpTree(spark, sfb).collect()
    graft.Caches.releaseAll(spark)
    val brute = Similarity.annBruteForce(spark, sfb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll(spark)
    forest should not be empty
    // shape: per query ranks are 1..k contiguous, n_trees in [1, 3]
    for ((_, rows) <- forest.groupBy(_.getLong(0))) {
      rows.map(_.getInt(4)).sorted.toSeq shouldBe (1 to rows.length)
      all(rows.map(_.getInt(2))) should (be >= 1 and be <= 3)
    }
    // recall@3 vs brute force NEVER drops vs the single tree: the
    // forest's candidate set is a superset (tree 0 is the s36 tree),
    // and under the total (cos desc, cand) order a candidate that
    // displaces a brute-top-3 pair must itself be brute-top-3
    def recall(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).count(brute).toDouble /
        brute.size
    recall(forest) should be >= recall(single)
    recall(forest) should be > 0.0
    // the diagnostic genuinely counts tree votes: some pair is
    // proposed by more than one tree on real data
    forest.map(_.getInt(2)).max should be >= 2
  }

  test("clusterReport: columns equal the gated component operators") {
    val rep = Similarity.clusterReport(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    graft.Caches.releaseAll(spark)
    val dist = Similarity.corpusClusters(spark, sf).collect()
      .groupBy(_.getInt(1))
      .map { case (c, rs) => c -> (rs.length.toLong, rs.map(_.getLong(2)).sum) }
    graft.Caches.releaseAll(spark)
    val sil = Similarity.silhouette(spark, sf).collect()
      .groupBy(_.getInt(1))
      .map { case (c, rs) => c -> rs.map(_.getLong(4)).sum }
    graft.Caches.releaseAll(spark)
    val pur = Similarity.clusterPurity(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getInt(2), r.getLong(4), r.getLong(5))).toMap
    graft.Caches.releaseAll(spark)
    rep.keySet shouldBe dist.keySet
    rep.foreach { case (c, r) =>
      withClue(s"cluster $c: ") {
        (r.getLong(1), r.getLong(2)) shouldBe dist(c)
        r.getLong(3) shouldBe sil(c) / dist(c)._1
        r.getInt(4) shouldBe pur(c)._1
        r.getLong(5) shouldBe pur(c)._2
        r.getLong(6) shouldBe pur(c)._3
      }
    }
  }

  test("clusterPurity: recomputes from assignment x labels, bounds hold") {
    val out = Similarity.clusterPurity(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    val assign = Similarity.corpusClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    graft.Caches.releaseAll(spark)
    import spark.implicits._
    val labels = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byCluster = assign.toSeq.groupBy(_._2)
      .map { case (c, vs) => c -> vs.map(v => labels(v._1)) }
    out.length shouldBe byCluster.size
    val tMaj = out.map(_.getLong(3)).sum
    val tN = out.map(_.getLong(1)).sum
    tN shouldBe assign.size.toLong
    out.foreach { r =>
      val c = r.getInt(0)
      val labs = byCluster(c)
      val counts = labs.groupBy(identity).map { case (l, ls) => l -> ls.size.toLong }
      withClue(s"cluster $c: ") {
        r.getLong(1) shouldBe labs.size.toLong
        // majority by (count DESC, label) — the pinned tiebreak
        val (ml, mc) = counts.toSeq.sortBy { case (l, n) => (-n, l) }.head
        r.getInt(2) shouldBe ml
        r.getLong(3) shouldBe mc
        r.getLong(4) shouldBe mc * 1000000L / labs.size
        val sumSq = counts.values.map(n => n * n).sum
        r.getLong(5) shouldBe
          1000000L - sumSq * 1000000L / (labs.size.toLong * labs.size)
        r.getLong(6) shouldBe tMaj * 1000000L / tN
        // purity at least 1/|labels| of the cluster; gini in [0, 1e6)
        r.getLong(4) should be >= 1000000L / counts.size
        r.getLong(5) should (be >= 0L and be < 1000000L)
      }
    }
  }
}
