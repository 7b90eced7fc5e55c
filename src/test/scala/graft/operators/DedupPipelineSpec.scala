package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}
import graft.functions.Text

/** End-to-end canonicalization on sf0.1 — the only scale factor whose
  * documents table contains real planted near-duplicates (max trigram
  * Jaccard 0.986; sf0.01 has none).
  */
class DedupPipelineSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.1"

  test("canonicalize finds near-dup clusters and maps them to min ids") {
    val result = Dedup.canonicalize(spark, sf, jaccardThreshold = 0.6).cache()
    val total = result.count()
    total shouldBe Tables.documents(spark, sf).count()

    val dups = result.filter(col("is_duplicate")).collect()
    dups.length should be > 0 // sf0.1 has planted near-dups
    // canonical ids point at a smaller doc_id in the same cluster
    dups.foreach { r =>
      r.getAs[Long]("canonical_id") should be < r.getAs[Long]("doc_id")
    }

    // every duplicate really is near its canonical: verify one pair's
    // trigram Jaccard independently
    val sample = dups.head
    val pair = Seq(sample.getAs[Long]("doc_id"), sample.getAs[Long]("canonical_id"))
    val sh = Text.tokenized(
        Tables.documents(spark, sf).filter(col("doc_id").isin(pair: _*)),
        "doc_id", "text")
      .select(col("doc_id"), explode(Text.shingles(col("tk"))).as("sh"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    // exact-dup chains can make a transitive link; just require overlap
    val Seq(x, y) = pair.map(sh.getOrElse(_, Set.empty[String]))
    val j = x.intersect(y).size.toDouble / math.max(1, x.union(y).size)
    j should be > 0.0

    // non-duplicates are their own canonical
    result.filter(!col("is_duplicate"))
      .filter(col("doc_id") =!= col("canonical_id")).count() shouldBe 0
    result.unpersist()
    graft.Caches.releaseAll(spark)
  }

  test("canonicalizeBest keeps the max-quality member of every cluster") {
    val best = Dedup.canonicalizeBest(spark, sf).cache()
    val quality = TextAnalysis.textStats(spark, sf)
      .select(col("doc_id"), col("quality")).cache()

    // exactly one keeper per cluster, and it is a member of the cluster
    val perCluster = best.groupBy("canonical_id")
      .agg(countDistinct("keep_id").as("nk"),
        sum(when(col("keep"), 1).otherwise(0)).as("nkeep"))
    perCluster.filter(col("nk") =!= 1).count() shouldBe 0
    best.filter(col("keep") && col("doc_id") =!= col("keep_id")).count() shouldBe 0

    // keeper quality is the cluster max (doc_id tiebreak on equal quality)
    val withQ = best.join(quality, "doc_id")
    val viol = withQ.as("m")
      .join(withQ.filter(col("keep")).as("k"), "canonical_id")
      .filter(col("m.quality") > col("k.quality"))
    viol.count() shouldBe 0

    best.unpersist(); quality.unpersist()
    graft.Caches.releaseAll(spark)
  }

  test("d28: the truth side of the recall curve matches a sequential " +
    "shingle recompute; the LSH guarantee and curve invariants hold") {
    val sfSmall = "/root/testdata/sf0.001"
    import spark.implicits._
    // independent truth: per-doc 3-gram shingle SETS from raw text
    val docs = graft.Tables.documents(spark, sfSmall)
      .select($"doc_id", $"text").collect()
      .map { r =>
        val tk = r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        r.getLong(0) -> tk.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
    val expPairs = (for {
      Array((a, sa), (b, sb)) <- docs.sortBy(_._1).combinations(2)
      ic = (sa & sb).size if ic > 0
    } yield {
      val un = sa.size + sb.size - ic
      (ic * 10 / un, 1L)
    }).toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Dedup.lshRecallCurve(spark, sfSmall).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    got.filter(_._1 >= 0).map(t => t._1 -> t._2).toMap shouldBe expPairs
    // curve invariants: caught never exceeds the bucket's pair base
    // (>= 0 buckets), every count non-negative, buckets within range
    got.foreach { case (b, np, nc) =>
      b should (be >= -1 and be <= 10)
      np should be >= 0L
      nc should be >= 0L
      if (b >= 0) nc should be <= np
    }
    // the S-curve is non-vacuous here: a high decile (>= 8) exists
    // with near-total recall, and the low decile catches almost none
    val high = got.filter(t => t._1 >= 8)
    high.map(_._2).sum should be > 0L
    (high.map(_._3).sum * 10) should be >= (high.map(_._2).sum * 9)
    val low = got.find(_._1 == 0).get
    low._3.toDouble / low._2 should be < 0.05
    // the LSH guarantee: identical shingle sets are ALWAYS caught —
    // bucket 10's pairs, when present, are caught one-for-one
    got.find(_._1 == 10).foreach { case (_, np, nc) => nc shouldBe np }
    graft.Caches.releaseAll(spark)
  }

  test("d29: the embedding-LSH curve matches an independent fold+bucket " +
    "recompute; multi-probe dominates band-for-band and rates climb") {
    val sfSmall = "/root/testdata/sf0.001"
    import spark.implicits._
    import graft.operators.Similarity
    // independent truth: the reference double-fold cosine + lshBucket
    // recomputed through a SEPARATE plan, banded in the driver
    val v = graft.Tables.embeddings(spark, sfSmall)
      .filter($"vec_id" % 2 === 0 && $"vec_id" < 2048)
      .select($"vec_id", $"embedding",
        Similarity.norm2Fold($"embedding").as("nrm"),
        Similarity.lshBucket($"embedding").as("bucket"))
    val pairs = v.as("x").join(v.as("y"), $"x.vec_id" < $"y.vec_id")
      .select(
        round(Similarity.dotFold($"x.embedding", $"y.embedding") /
          sqrt($"x.nrm" * $"y.nrm"), 6).as("cos"),
        bit_count($"x.bucket".bitwiseXOR($"y.bucket")).cast("int").as("hd"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    def band(c: Double): Int =
      if (c < 0.0) 0 else if (c < 0.2) 1 else if (c < 0.4) 2
      else if (c < 0.6) 3 else if (c < 0.8) 4 else 5
    val exp = pairs.groupBy(p => band(p._1)).map { case (b, ps) =>
      (b, ps.length.toLong, ps.count(_._2 == 0).toLong,
        ps.count(_._2 <= 1).toLong)
    }.toSeq.sortBy(_._1)
    val got = Dedup.embedLshRecallCurve(spark, sfSmall).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe exp
    // the whole sample is accounted for
    val n = v.count()
    got.map(_._2).sum shouldBe n * (n - 1) / 2
    // multi-probe dominates the single bucket in every band, and
    // neither exceeds the band's pair base
    got.foreach { case (_, np, nsb, np1) =>
      nsb should be <= np1
      np1 should be <= np
    }
    // capture rates climb with cosine over the populated bands — the
    // S-curve direction (near-parallel pairs rarely straddle a plane)
    val rates = got.filter(_._2 >= 10)
      .map(t => t._4.toDouble / t._2)
    rates.zip(rates.drop(1)).foreach { case (a, b) => b should be >= a }
    graft.Caches.releaseAll(spark)
  }

  /** Sequential reference for d30: suffix array by library sort +
    * adjacent LCP + per-position max, over the same bounded slice.
    */
  private def suffixRepeatsRef(texts: Seq[(Long, String)], win: Int,
      minRep: Int): Map[Int, Long] = {
    val pos = for {
      (id, t) <- texts
      off <- 0 until t.length
    } yield (id, off, t.substring(off, math.min(off + win, t.length)))
    val sa = pos.sortBy { case (id, off, sfx) => (sfx, id, off) }
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(math.min(a.length, b.length), win)
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i
    }
    val adj = sa.zip(sa.drop(1)).map { case (x, y) => lcp(x._3, y._3) }
    val perPos = sa.indices.map { r =>
      val before = if (r > 0) adj(r - 1) else Int.MinValue
      val after = if (r < adj.length) adj(r) else Int.MinValue
      math.max(before, after)
    }
    perPos.filter(_ >= minRep).groupBy(identity)
      .map { case (l, v) => (l, v.size.toLong) }
  }

  test("d30: the suffix-repeat histogram matches a sequential suffix-array " +
    "recompute, and the rank-neighbor max equals the all-pairs truth on a " +
    "small slice") {
    val sfSmall = "/root/testdata/sf0.001"
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sfSmall)
      .filter($"doc_id" < 64 && expr("length(text) > 0"))
      .select($"doc_id", substring($"text", 1, 128))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val exp = suffixRepeatsRef(texts, win = 64, minRep = 8)
    val got = Dedup.suffixRepeats(spark, sfSmall).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    got shouldBe exp
    // the suffix-array property itself, brute-forced on a small slice:
    // max adjacent-LCP == max LCP against EVERY other position
    val small = texts.take(4).map { case (id, t) => (id, t.take(64)) }
    val win = 32
    val pos = for {
      (id, t) <- small; off <- 0 until t.length
    } yield (id, off, t.substring(off, math.min(off + win, t.length)))
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(math.min(a.length, b.length), win)
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i
    }
    val brute = pos.map { p =>
      pos.filter(q => q != p).map(q => lcp(p._3, q._3)).max
    }
    val sa = pos.sortBy { case (id, off, sfx) => (sfx, id, off) }
    val adj = sa.zip(sa.drop(1)).map { case (x, y) => lcp(x._3, y._3) }
    val viaSa = sa.indices.map { r =>
      val b = if (r > 0) adj(r - 1) else Int.MinValue
      val a = if (r < adj.length) adj(r) else Int.MinValue
      math.max(b, a)
    }
    val bruteBySa = sa.map(p => brute(pos.indexOf(p)))
    viaSa shouldBe bruteBySa
    graft.Caches.releaseAll(spark)
  }

  test("d31: the scrub matches a sequential coverage replay, cuts are " +
    "non-vacuous, and a clean corpus passes through untouched") {
    val sfSmall = "/root/testdata/sf0.001"
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sfSmall)
      .filter($"doc_id" < 64 && expr("length(text) > 0"))
      .select($"doc_id", substring($"text", 1, 128))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val win = 64
    // sequential per-position repeat lengths (suffix sort + adjacent LCP)
    val pos = for {
      (id, t) <- texts; off <- 0 until t.length
    } yield (id, off, t.substring(off, math.min(off + win, t.length)))
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(math.min(a.length, b.length), win)
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i
    }
    val sa = pos.sortBy { case (id, off, sfx) => (sfx, id, off) }
    val adj = sa.zip(sa.drop(1)).map { case (x, y) => lcp(x._3, y._3) }
    val lens = sa.indices.map { r =>
      val before = if (r > 0) adj(r - 1) else 0
      val after = if (r < adj.length) adj(r) else 0
      (sa(r)._1, sa(r)._2, math.max(before, after))
    }
    // replay the running-max coverage per doc
    val exp = lens.groupBy(_._1).map { case (id, rows) =>
      val byOff = rows.sortBy(_._2)
      var rend = -1L
      val kept = new StringBuilder
      var nCut = 0L
      val text = texts.find(_._1 == id).get._2
      byOff.foreach { case (_, off, rl) =>
        if (rl >= 16) rend = math.max(rend, off.toLong + rl)
        if (off >= rend) kept += text.charAt(off) else nCut += 1
      }
      (id, (kept.length.toLong, nCut, kept.toString))
    }
    val got = Dedup.suffixScrub(spark, sfSmall).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    got shouldBe exp
    // non-vacuous: some docs lose spans, some survive intact
    got.values.count(_._2 > 0) should be > 0
    got.values.count(_._2 == 0) should be > 0
    // kept + cut always accounts for every char
    texts.foreach { case (id, t) =>
      val (k, c, s) = got(id)
      k + c shouldBe t.length.toLong
      s.length.toLong shouldBe k
    }
    graft.Caches.releaseAll(spark)
  }
}
