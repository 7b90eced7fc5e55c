package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** Invariants for the round-4 corpus-signal operators beyond their
  * oracle gates.
  */
class QualitySignalsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("tokenDrift: exact integer ranking, recomputable drift, slice symmetry") {
    import graft.functions.Text
    val rows = TextAnalysis.tokenDrift(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // recompute the totals independently
    val occ = Tables.documents(spark, sf)
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), explode(Text.toks(col("text"))).as("token"))
    val tots = occ.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (totA, totB) = (tots("en"), tots("de"))
    rows.foreach { r =>
      val (tfA, tfB) = (r.getLong(1), r.getLong(2))
      val numq = r.getLong(3)
      // numq is the exact common-denominator numerator
      numq shouldBe math.abs(tfA * totB - tfB * totA)
      // the one float step recomputes from the integers
      r.getDouble(4) shouldBe
        BigDecimal(numq / (2.0 * totA * totB))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // movers are ranked descending on the exact integer
    val numqs = rows.map(_.getLong(3)).toSeq
    numqs shouldBe numqs.sorted.reverse
    // slice order only flips the tf columns — numq is symmetric
    val swapped = TextAnalysis.tokenDrift(spark, sf, sliceA = "de", sliceB = "en")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.Caches.releaseAll(spark)
    rows.foreach(r => swapped(r.getString(0)) shouldBe r.getLong(3))
  }

  test("qualityClassifier: bounded algebraic-sigmoid score, keep iff rounded score clears") {
    val rows = TextAnalysis.qualityClassifier(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val score = r.getDouble(3)
      score should (be > -1.0 and be < 1.0) // x/(1+|x|) never saturates
      r.getBoolean(4) shouldBe (score >= 0.25)
    }
    // a useful filter rejects SOME of the corpus and keeps some
    rows.count(_.getBoolean(4)) should be > 0
    rows.count(!_.getBoolean(4)) should be > 0
    // monotone in the logit: recompute from the feature pass and check
    // score order follows logit order
    val feats = TextAnalysis.textStats(spark, sf).collect()
      .map { f =>
        val logit = 4.0 * f.getDouble(f.fieldIndex("quality")) -
          0.5 * f.getDouble(f.fieldIndex("stop_ratio")) +
          0.25 * (f.getDouble(f.fieldIndex("avg_tok_len")) - 4.0) +
          0.3 * (if (f.getString(1) == "en") 1.0 else 0.0) - 1.0
        f.getLong(0) -> logit
      }.toMap
    val byLogit = rows.sortBy(r => (feats(r.getLong(0)), r.getLong(0)))
    byLogit.map(_.getDouble(3)).toSeq shouldBe sorted
  }

  test("corpusReport: per-lang rollup recomputable from its gated inputs") {
    import spark.implicits._
    val rows = TextAnalysis.corpusReport(spark, sf).collect()
    rows should not be empty
    // lang set matches the corpus; ratios bounded; counts consistent
    val langs = graft.Tables.documents(spark, sf)
      .select($"lang").distinct().collect().map(_.getString(0)).toSet
    rows.map(_.getString(0)).toSet shouldBe langs
    rows.foreach { r =>
      r.getLong(2) should be <= r.getLong(1) // n_distinct <= n_docs
      r.getDouble(3) should (be >= 0.0 and be <= 1.0)
      r.getDouble(7) should (be >= 0.0 and be <= 1.0)
      r.getDouble(6) should (be > -1.0 and be < 1.0)
    }
    // avg_score is exactly the integer-quantized mean of the t16 scores
    val scores = TextAnalysis.qualityClassifier(spark, sf).collect()
      .groupBy(_.getString(1))
      .map { case (l, rs) =>
        val q = rs.map(r => math.round(r.getDouble(3) * 1e6))
        l -> BigDecimal(q.sum.toDouble / q.length / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    rows.foreach(r => r.getDouble(6) shouldBe scores(r.getString(0)))
  }

  test("tokenGini: exact rational impurity, recomputed from raw token lists") {
    import graft.functions.Text
    val got = TextAnalysis.tokenGini(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), Text.toks(col("text")).as("tk")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got.size shouldBe toks.count(_._2.nonEmpty)
    got.foreach { case (id, r) =>
      val tf = toks(id).groupBy(identity).map(_._2.size.toLong)
      withClue(s"doc $id: ") {
        r.getLong(1) shouldBe tf.sum // n_tokens
        r.getLong(2) shouldBe tf.size.toLong // n_distinct
        r.getLong(3) shouldBe tf.map(f => f * f).sum // sumsq
        val gini = r.getDouble(4)
        gini should (be >= 0.0 and be < 1.0)
        gini shouldBe BigDecimal(1.0 - r.getLong(3).toDouble / (tf.sum * tf.sum))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        // all-distinct docs sit exactly at 1 - 1/n
        if (tf.forall(_ == 1L))
          r.getLong(3) shouldBe r.getLong(1)
      }
    }
  }

  test("clusterStats histogram mass equals the corpus size") {
    // every document sits in exactly one cluster, so
    // sum(cluster_size * n_clusters) must reproduce the corpus count
    val total = Tables.documents(spark, sf).count()
    val mass = Dedup.clusterStats(spark, sf)
      .agg(sum(col("cluster_size") * col("n_clusters")))
      .head().getLong(0)
    mass shouldBe total
    graft.Caches.releaseAll(spark)
  }

  test("ngramNovelty is a ratio in [0,1]; exact-dup docs score zero") {
    val rows = TextAnalysis.ngramNovelty(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val nov = r.getDouble(r.fieldIndex("novelty"))
      nov should (be >= 0.0 and be <= 1.0)
    }
    graft.Caches.releaseAll(spark)

    // a doc with an exact duplicate shares every shingle with its twin
    // → zero of its occurrences are df == 1 (sf0.1: the only scale with
    // planted exact duplicates)
    val sf1 = "/root/testdata/sf0.1"
    val dupIds = Dedup.exact(spark, sf1).filter(col("n_copies") >= 2)
      .join(Tables.documents(spark, sf1)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash")),
        "content_hash")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    dupIds should not be empty
    val novByDoc = TextAnalysis.ngramNovelty(spark, sf1)
      .filter(col("doc_id").isin(dupIds.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    novByDoc.foreach { case (id, nov) =>
      withClue(s"doc $id has an exact twin but novelty $nov: ") {
        nov shouldBe 0.0
      }
    }
    graft.Caches.releaseAll(spark)
  }

  test("gopherRules: every flag recomputes from the raw text, all-integer") {
    val rows = TextAnalysis.gopherRules(spark, sf).collect()
    rows should not be empty
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.length shouldBe texts.count { case (_, t) =>
      t.toLowerCase.split("[^a-z0-9]+").exists(_.nonEmpty)
    }
    val stops = TextAnalysis.Stopwords.toSet
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val n = toks.length.toLong
      val tf = toks.groupBy(identity).map(_._2.length.toLong)
      val grams = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val chars = toks.map(_.length.toLong).sum
      r.getLong(1) shouldBe n
      r.getBoolean(2) shouldBe (n >= 20 && n <= 100000)
      r.getBoolean(3) shouldBe (3 * n <= chars && chars <= 10 * n)
      r.getBoolean(4) shouldBe (toks.toSet.count(stops) >= 2)
      r.getBoolean(5) shouldBe (5 * tf.max <= n)
      r.getBoolean(6) shouldBe
        (10 * (grams.size - grams.distinct.size) <= 3 * grams.size)
      r.getBoolean(7) shouldBe
        (r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4) &&
          r.getBoolean(5) && r.getBoolean(6))
    }
    // a useful gate rejects SOME of the corpus at sf0.01 and keeps some
    val big = TextAnalysis.gopherRules(spark, "/root/testdata/sf0.01").collect()
    big.count(_.getBoolean(7)) should be > 0
    big.count(!_.getBoolean(7)) should be > 0
  }

  test("bigramLm: qp sums recompute from the raw text, all-integer") {
    // independent recompute of the add-one-smoothed conditional
    // probability per bigram occurrence: qp = round((c2+1)/(c1+V)·1e9)
    // with corpus-global unigram counts c1, bigram counts c2, and
    // vocabulary size V — then per-doc n_bigrams/sum_qp/avg_qp.
    val rows = TextAnalysis.bigramLm(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val toksByDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      .toMap
    val uniC = toksByDoc.values.flatten
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val bgByDoc = toksByDoc.map { case (id, tk) =>
      id -> tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }
    val bgC = bgByDoc.values.flatten
      .groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
    val v = uniC.size.toLong
    // docs with < 2 tokens have no bigrams and must drop out
    rows.length shouldBe bgByDoc.count(_._2.nonEmpty)
    def halfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    rows.foreach { r =>
      val id = r.getLong(0)
      val grams = bgByDoc(id)
      val qps = grams.map { g =>
        val w1 = g.substring(0, g.indexOf(' '))
        halfUp((bgC(g) + 1).toDouble / (uniC(w1) + v) * 1e9)
      }
      withClue(s"doc $id: ") {
        r.getLong(1) shouldBe grams.size.toLong // n_bigrams
        r.getLong(2) shouldBe qps.sum // sum_qp
        r.getLong(3) shouldBe halfUp(qps.sum.toDouble / grams.size) // avg_qp
      }
    }
  }

  test("chi2Keyness: contingency recomputes in BigInt, ranking holds") {
    val rows = TextAnalysis.chi2Keyness(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val occ = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split("[^a-z0-9]+")
        .filter(_.nonEmpty).map(t => (r.getString(0) == "en", t)))
    val aM = occ.filter(_._1).groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val bM = occ.filterNot(_._1).groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val na = occ.count(_._1).toLong
    val nb = occ.length - na
    def chi2(a: Long, b: Long): (BigInt, Boolean) = {
      val det = BigInt(a) * (nb - b) - BigInt(b) * (na - a)
      val num = BigInt(na + nb) * det * det * 1000000
      val den = BigInt(a + b) * (na + nb - a - b) * BigInt(na) * nb
      (num / den, det > 0)
    }
    rows.foreach { r =>
      val t = r.getString(0)
      val (a, b) = (aM.getOrElse(t, 0L), bM.getOrElse(t, 0L))
      withClue(s"token $t: ") {
        r.getLong(1) shouldBe a
        r.getLong(2) shouldBe b
        val (c2, over) = chi2(a, b)
        r.getLong(4) shouldBe c2.toLong
        r.getBoolean(3) shouldBe over
        a + b should be >= 5L
      }
    }
    // ranking: (chi2 DESC, token) and it is the TRUE top slice of the
    // full eligible vocabulary
    val keys = rows.map(r => (-r.getLong(4), r.getString(0))).toSeq
    keys shouldBe keys.sorted
    val all = (aM.keySet ++ bM.keySet).toSeq
      .map(t => (aM.getOrElse(t, 0L), bM.getOrElse(t, 0L), t))
      .filter { case (a, b, _) => a + b >= 5 }
      .map { case (a, b, t) => (-chi2(a, b)._1, t) }.sorted
      .take(rows.length)
    rows.map(_.getString(0)).toSeq shouldBe all.map(_._2)
    // the language slices genuinely differ in vocabulary: both
    // over/under-represented directions appear
    rows.map(_.getBoolean(3)).distinct.length shouldBe 2
  }

  test("kwic: contexts replay from raw tokens; edges truncate cleanly") {
    val rows = TextAnalysis.kwic(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val toksByDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      .toMap
    // the data-derived target: (count DESC, token) top-1
    val counts = toksByDoc.values.flatten
      .groupBy(identity).map { case (t, ts) => t -> ts.size }
    val target = counts.toSeq.sortBy { case (t, n) => (-n, t) }.head._1
    rows.foreach(_.getString(3) shouldBe target)
    // completeness + exact contexts
    val exp = toksByDoc.toSeq.flatMap { case (id, tks) =>
      tks.zipWithIndex.collect { case (t, i) if t == target =>
        val pos = i + 1
        (id, pos.toLong,
          tks.slice(math.max(0, i - 3), i).mkString(" "),
          tks.slice(i + 1, i + 4).mkString(" "))
      }
    }.toSet
    rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getString(4))).toSet shouldBe exp
    // document edges genuinely truncate on this corpus
    rows.exists(_.getString(2).isEmpty) ||
      rows.exists(r => r.getString(2).split(" ").length < 3) shouldBe true
  }

  test("diceCollocations: score recomputes, true top slice, bounds") {
    val rows = TextAnalysis.diceCollocations(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val toks = Tables.documents(spark, sf)
      .select(col("text")).collect()
      .map(_.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val bg = toks.flatMap(_.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
      .filter(_._2 >= 3)
    def dice(w1: String, w2: String, c12: Long): Long =
      2 * c12 * 1000000L / (uni(w1) + uni(w2))
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      withClue(s"($w1,$w2): ") {
        r.getLong(2) shouldBe bg((w1, w2))
        r.getLong(3) shouldBe uni(w1)
        r.getLong(4) shouldBe uni(w2)
        r.getLong(5) shouldBe dice(w1, w2, bg((w1, w2)))
        // dice is a genuine fraction: 2c12 <= c1 + c2 always
        r.getLong(5) should be <= 1000000L
      }
    }
    // the emitted 50 are the TRUE top of the full eligible pair space
    val all = bg.toSeq.map { case ((w1, w2), c12) =>
      (-dice(w1, w2, c12), w1, w2)
    }.sorted.take(rows.length)
    rows.map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      all.map(t => (t._2, t._3))
  }

  test("burstiness: dispersion recomputes, ranking and floor hold") {
    val rows = TextAnalysis.burstiness(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val toksByDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      .toMap
    val n = toksByDoc.size.toLong
    val perTok = toksByDoc.toSeq
      .flatMap { case (id, tks) => tks.map(t => (t, id)) }
      .groupBy(_._1)
      .map { case (t, occ) =>
        val byDoc = occ.groupBy(_._2).map(_._2.length.toLong)
        (t, byDoc.size.toLong, byDoc.sum, byDoc.map(x => x * x).sum)
      }.filter(_._3 >= 5).map(x => x._1 -> x).toMap
    rows.length shouldBe perTok.size
    rows.foreach { r =>
      val t = r.getString(0)
      val (_, ndw, tf, ssq) = perTok(t)
      withClue(s"token $t: ") {
        r.getLong(1) shouldBe ndw
        r.getLong(2) shouldBe tf
        r.getLong(3) shouldBe ssq
        r.getLong(4) shouldBe (n * ssq - tf * tf) * 1000000L / (n * tf)
        // variance is nonnegative, so D never goes below zero; and a
        // token in every doc with equal counts would sit at the floor
        r.getLong(4) should be >= 0L
      }
    }
    val keys = rows.map(r => (-r.getLong(4), r.getString(0))).toSeq
    keys shouldBe keys.sorted
    rows.map(_.getLong(4)).distinct.length should be > 1
  }

  test("featureHash: buckets/signs recompute from MessageDigest md5") {
    val rows = TextAnalysis.featureHash(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toksByDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      .toMap
    // independent vector build per doc
    val expect = toksByDoc.map { case (id, tks) =>
      val v = new Array[Long](16)
      tks.foreach { t =>
        val h = md5hex(t)
        val dim = (java.lang.Long.parseLong(h.substring(0, 4), 16) % 16).toInt
        val sgn = if (java.lang.Long.parseLong(h.substring(4, 5), 16) % 2 == 0)
          1L else -1L
        v(dim) += sgn
      }
      id -> v
    }
    rows.foreach { r =>
      val (id, dim) = (r.getLong(0), r.getInt(1))
      withClue(s"doc $id dim $dim: ") {
        dim should (be >= 0 and be < 16)
        r.getLong(2) shouldBe expect(id)(dim)
        r.getLong(2) should not be 0L
      }
    }
    // completeness: every nonzero expected entry appears
    val got = rows.map(r => (r.getLong(0), r.getInt(1))).toSet
    expect.foreach { case (id, v) =>
      v.zipWithIndex.foreach { case (x, d) =>
        withClue(s"doc $id dim $d: ") { got.contains((id, d)) shouldBe x != 0L }
      }
    }
    // signs genuinely cancel somewhere (the unbiasedness mechanism)
    expect.exists { case (id, v) =>
      v.exists(_ == 0L) && toksByDoc(id).nonEmpty
    } shouldBe true
  }

  test("perplexityBucket: cross-corpus scores recompute; rank-quantile cut") {
    val rows = TextAnalysis.perplexityBucket(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // independent recompute: the reference LM sees ONLY the even-slice
    // counts; unseen bigrams/left-unigrams coalesce to 0 (add-one
    // smoothing's native OOV answer)
    val toksByDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      .toMap
    val refDocs = toksByDoc.filter(_._1 % 2 == 0)
    val uniR = refDocs.values.flatten
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val bgR = refDocs.values
      .flatMap(_.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
    val v = uniR.size.toLong
    val bgByDoc = toksByDoc.map { case (id, tk) =>
      id -> tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }
    def halfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    rows.length shouldBe bgByDoc.count(_._2.nonEmpty)
    val avgById = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val grams = bgByDoc(id)
      val qps = grams.map { g =>
        val w1 = g.substring(0, g.indexOf(' '))
        halfUp((bgR.getOrElse(g, 0L) + 1).toDouble /
          (uniR.getOrElse(w1, 0L) + v) * 1e9)
      }
      withClue(s"doc $id: ") {
        r.getLong(1) shouldBe grams.size.toLong
        r.getLong(2) shouldBe halfUp(qps.sum.toDouble / grams.size)
      }
    }
    // equal-width rank quantiles over (avg_qp DESC, doc_id): sorted
    // position i (0-based) lands in bucket i*3 DIV total + 1; keep
    // drops exactly the tail bucket
    val sorted = rows.sortBy(r => (-r.getLong(2), r.getLong(0)))
    val total = sorted.length
    sorted.zipWithIndex.foreach { case (r, i) =>
      withClue(s"doc ${r.getLong(0)} rank $i: ") {
        r.getInt(3) shouldBe (i.toLong * 3 / total + 1).toInt
        r.getBoolean(4) shouldBe (r.getInt(3) < 3)
      }
    }
    // the cut is a partition: every scored doc appears exactly once
    avgById.size shouldBe total
  }

  test("cdcChunks: content-local boundaries survive prefix edits; exact partition") {
    import spark.implicits._
    // the same long token stream with three tokens PREPENDED: CDC
    // boundaries depend only on the local window, so after the first
    // content-determined cut both docs chunk IDENTICALLY — a
    // fixed-window chunker (p14) would share nothing (offsets shift)
    val base = (1 to 400).map(i => s"w${i * 7 % 131}x$i").mkString(" ")
    val edited = "zz0 zz1 zz2 " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunksFrames(docs).collect()
    val d1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    val d2 = out.filter(_.getLong(0) == 2L).sortBy(_.getLong(1))
    // chunking is a PARTITION of the token stream: counts sum to the
    // doc length, chunk_nos are contiguous from 0, starts are gapless
    d1.map(_.getLong(3)).sum shouldBe 400L
    d2.map(_.getLong(3)).sum shouldBe 403L
    d1.map(_.getLong(1)).toSeq shouldBe d1.indices.map(_.toLong)
    d1.sliding(2).foreach {
      case Array(a, b) =>
        b.getLong(2) shouldBe a.getLong(2) + a.getLong(3)
      case _ =>
    }
    // edit resilience: every chunk except the edited first one is
    // shared verbatim (boundaries re-synchronize immediately)
    val h1 = d1.map(_.getString(4)).toSet
    val h2 = d2.map(_.getString(4)).toSet
    d1.length should be > 2 // divisor=64 over 400 tokens: real cuts
    h1.intersect(h2).size should be >= h1.size - 1
    // determinism across runs
    val again = TextAnalysis.cdcChunksFrames(docs).collect()
    again.map(_.toString).sorted.toSeq shouldBe out.map(_.toString).sorted.toSeq
  }

  test("knBigramLm: counts recompute, ppb terms exact, mass telescopes") {
    val rows = TextAnalysis.knBigramLm(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // independent recompute of all five count families from raw text
    val toksByDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      .toMap
    val bgC = toksByDoc.values
      .flatMap(_.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
    val c1M = bgC.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val succM = bgC.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val predM = bgC.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val b = bgC.size.toLong
    rows.length shouldBe bgC.size
    val G = BigInt(1000000000L)
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      val c12 = r.getAs[Long]("c12")
      withClue(s"($w1,$w2): ") {
        c12 shouldBe bgC((w1, w2))
        r.getAs[Long]("c1") shouldBe c1M(w1)
        r.getAs[Long]("n1p_succ") shouldBe succM(w1)
        r.getAs[Long]("n1p_pred") shouldBe predM(w2)
        r.getAs[Long]("b") shouldBe b
        // both ppb terms recompute via BigInt floor division
        val t1 = (BigInt(100L * c12 - 75L).max(0) * G / BigInt(100L * c1M(w1)))
        val t2 = (BigInt(75L) * succM(w1) * G / BigInt(100L * c1M(w1))) *
          (BigInt(predM(w2)) * G / b) / G
        r.getAs[Long]("term1_ppb") shouldBe t1.toLong
        r.getAs[Long]("term2_ppb") shouldBe t2.toLong
        r.getAs[Long]("p_kn_ppb") shouldBe (t1 + t2).toLong
      }
    }
    // continuation counts partition the bigram-type space
    rows.groupBy(_.getString(1)).map(_._2.head.getAs[Long]("n1p_pred"))
      .sum shouldBe b
    // per-context mass telescopes: sum of discounted bigram terms plus
    // lambda = D*N1+(w1.)/c1 recovers 1 exactly up to one floor loss
    // per row (term1 floors) plus one for lambda itself
    rows.groupBy(_.getString(0)).foreach { case (w1, rs) =>
      val lam = (BigInt(75L) * succM(w1) * G / BigInt(100L * c1M(w1))).toLong
      val mass = rs.map(_.getAs[Long]("term1_ppb")).sum + lam
      withClue(s"context $w1: ") {
        mass should be <= 1000000000L
        mass should be >= 1000000000L - (rs.length + 1).toLong
      }
    }
    // the GT histogram over the same corpus recomputes too (t38 rides
    // the same count families)
    val gt = TextAnalysis.goodTuring(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    val uniC = toksByDoc.values.flatten
      .groupBy(identity).map { case (_, ws) => ws.size.toLong }
    val histM = uniC.groupBy(identity).map { case (r, rs) => r -> rs.size.toLong }
    gt.length shouldBe histM.size
    val n = uniC.sum
    val n1 = histM.getOrElse(1L, 0L)
    gt.foreach { r =>
      val rv = r.getAs[Long]("r")
      withClue(s"r=$rv: ") {
        r.getAs[Long]("n_r") shouldBe histM(rv)
        r.getAs[Long]("n_next") shouldBe histM.getOrElse(rv + 1, 0L)
        r.getAs[Long]("rstar_ppm") shouldBe
          ((rv + 1) * histM.getOrElse(rv + 1, 0L) * 1000000L) / histM(rv)
        r.getAs[Long]("p0_ppm") shouldBe n1 * 1000000L / n
        r.getAs[Long]("n_tokens") shouldBe n
      }
    }
    // the raw estimator's sparse tail: the largest count has no
    // successor bucket, so its adjusted count collapses to 0
    gt.maxBy(_.getAs[Long]("r")).getAs[Long]("rstar_ppm") shouldBe 0L

    // the KN insight is non-vacuous on this corpus: continuation
    // counts genuinely vary across successor words, so the backoff
    // term is not a constant rescale of the discount
    rows.map(_.getAs[Long]("n1p_pred")).distinct.length should be > 1
    rows.map(_.getAs[Long]("term2_ppb")).distinct.length should be > 1
  }

  test("zipfFit: exact sequential least-squares parity, negative slopes") {
    import graft.functions.{IntLog, Text}
    val rows = TextAnalysis.zipfFit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // sequential reference: per source, rank tokens (freq DESC, token),
    // take the top 100, regress log2fixed(freq) on log2fixed(rank)
    val cnt = Tables.documents(spark, sf)
      .select(col("source"), explode(Text.toks(col("text"))).as("token"))
      .groupBy("source", "token").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = cnt.groupBy(_._1)
    for ((src, rws) <- bySrc) {
      val ranked = rws.map(t => (t._3, t._2))
        .sortBy { case (f, tok) => (-f, tok) }.take(100)
      val xy = ranked.zipWithIndex.map { case ((f, _), i) =>
        (IntLog.log2FixedRef(i + 1L), IntLog.log2FixedRef(f))
      }
      val n = BigInt(xy.length)
      val sx = xy.map(p => BigInt(p._1)).sum
      val sy = xy.map(p => BigInt(p._2)).sum
      val sxy = xy.map(p => BigInt(p._1) * p._2).sum
      val sxx = xy.map(p => BigInt(p._1) * p._1).sum
      val syy = xy.map(p => BigInt(p._2) * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slope =
        if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)
      val sst = n * syy - sy * sy
      val r2 = if (sst == 0) BigInt(1000000)
        else num * num * 1000000 / (den * sst)
      val got = rows(src)
      got.getAs[Long]("n_ranks") shouldBe xy.length.toLong
      got.getAs[Long]("slope_ppm") shouldBe slope.toLong
      got.getAs[Long]("r2_ppm") shouldBe r2.toLong
      // natural-ish text: frequency falls with rank
      got.getAs[Long]("slope_ppm") should be < 0L
      got.getAs[Long]("r2_ppm") should (be >= 0L and be <= 1000000L)
    }
  }

  test("vocabRichness: exact sequential recompute, richness laws") {
    import graft.functions.{IntLog, Text}
    val rows = TextAnalysis.vocabRichness(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    rows should not be empty
    val cnt = Tables.documents(spark, sf)
      .select(col("source"), explode(Text.toks(col("text"))).as("token"))
      .groupBy("source", "token").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((src, rws) <- cnt.groupBy(_._1)) {
      val rs = rws.map(_._3)
      val n = rs.sum
      val v = rs.length.toLong
      val hapax = rs.count(_ == 1L).toLong
      val s2 = rs.map(r => BigInt(r) * r).sum
      val yule = ((s2 - n) * BigInt(10000000000L) / (BigInt(n) * n)).toLong
      val (lv, ln) = (IntLog.log2FixedRef(v), IntLog.log2FixedRef(n))
      val herdan = if (ln > 0) Some(lv * 1000000L / ln) else None
      rows(src) shouldBe ((n, v, hapax, s2.toLong, yule, herdan))
      // richness laws: hapax ⊆ types ⊆ tokens; S2 >= N (r² >= r);
      // Herdan's C in (0, 1e6] since V <= N
      hapax should be <= v
      v should be <= n
      s2.toLong should be >= n
      herdan.foreach(c => c should (be > 0L and be <= 1000000L))
    }
  }

  test("tfidfTerms: exact sequential recompute, idf-kill, rank laws") {
    import graft.functions.{IntLog, Text}
    val rows = TextAnalysis.tfidfTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(Text.toks(col("text"))).as("token"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nd = Tables.documents(spark, sf).count()
    val lnd = IntLog.log2FixedRef(nd)
    val dfm = toks.distinct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val exp = toks.groupBy(_._1).flatMap { case (d, ts) =>
      ts.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
        .map { case (t, c) => (t, c * (lnd - IntLog.log2FixedRef(dfm(t)))) }
        .filter(_._2 >= 1)
        .sortBy { case (t, w) => (-w, t) }.take(3).zipWithIndex
        .map { case ((t, w), i) => (d, i + 1) -> ((t, w)) }
    }
    rows shouldBe exp
    // a token in every document never surfaces as a keyword
    val everywhere = dfm.filter(_._2 == nd).keySet
    rows.values.foreach { case (t, _) => everywhere should not contain t }
    // ranks contiguous from 1 per doc
    rows.keys.groupBy(_._1).values.foreach { g =>
      g.map(_._2).toSeq.sorted shouldBe (1 to g.size)
    }
  }

  test("jsDrift: exact sequential recompute, tracks true JSD, bounded") {
    import graft.functions.{IntLog, Text}
    val rows = TextAnalysis.jsDrift(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val cnt = Tables.documents(spark, sf)
      .select(col("source"), explode(Text.toks(col("text"))).as("token"))
      .groupBy("source", "token").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val vocab = cnt.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nn = vocab.values.sum
    val qPpm = vocab.view.mapValues(c => c * 1000000L / nn).toMap
    def s(d: Iterable[Long]): Long =
      d.filter(_ >= 1).map(v => v * IntLog.log2FixedRef(v)).sum
    val sQ = s(qPpm.values)
    for ((src, rws) <- cnt.groupBy(_._1)) {
      val st = rws.map(_._3).sum
      val pCnt = rws.map(t => t._2 -> t._3).toMap
      // .toSeq before mapping to values: Set.map would collapse equal
      // ppm values and silently shrink the sums
      val pPpm = vocab.keys.toSeq.map { tok =>
        tok -> pCnt.getOrElse(tok, 0L) * 1000000L / st
      }.toMap
      val mPpm = vocab.keys.toSeq.map(tok => (pPpm(tok) + qPpm(tok)) / 2)
      val (sP, sM) = (s(pPpm.values), s(mPpm))
      val jsd = (sP + sQ) / 2 - sM
      val got = rows(src)
      got.getAs[Long]("n_tokens") shouldBe st
      got.getAs[Long]("s_p") shouldBe sP
      got.getAs[Long]("s_m") shouldBe sM
      got.getAs[Long]("s_q") shouldBe sQ
      got.getAs[Long]("jsd_fix") shouldBe jsd
      // the fixed-point value tracks the true JSD of the ppm-grid
      // distributions (log2 base): within the documented truncation
      def h(d: Iterable[Double]): Double =
        -d.filter(_ > 0).map(p => p * math.log(p) / math.log(2)).sum
      val pD = vocab.keys.toSeq.map(t => pPpm(t) / 1e6)
      val qD = vocab.keys.toSeq.map(t => qPpm(t) / 1e6)
      val mD = pD.zip(qD).map { case (a, b) => (a + b) / 2 }
      val trueJsd = h(mD) - (h(pD) + h(qD)) / 2
      val gotJsd = jsd.toDouble / (1L << IntLog.F) / 1e6
      // bounded divergence, approximated on the grid: same ballpark
      gotJsd shouldBe trueJsd +- 0.02
      trueJsd should (be >= -1e-9 and be <= 1.0)
    }
  }
}
