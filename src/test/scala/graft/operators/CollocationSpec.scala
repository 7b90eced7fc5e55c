package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** t27/t28 — collocation mining and TextRank keywords, each checked
  * against an independent sequential recompute from the raw document
  * text (the GraphAnalyticsSpec discipline): the distributed plan and
  * a plain-Scala reference must agree row by row, including the
  * integer fixed-point arithmetic and the rank tiebreaks.
  */
class CollocationSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The shared tokenization, recomputed independently (must stay in
    * lockstep with graft.functions.Text.toks), keyed by doc_id.
    */
  private lazy val docTokensById: Seq[(Long, Array[String])] = {
    import spark.implicits._
    graft.Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
      .toSeq
  }

  private def docTokens: Seq[Array[String]] = docTokensById.map(_._2)

  test("t27: PMI top-50 matches a sequential integer recompute") {
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val pair = scala.collection.mutable.Map.empty[(String, String), Long]
    var n = 0L
    docTokens.foreach { tk =>
      tk.foreach { w => uni(w) = uni.getOrElse(w, 0L) + 1; n += 1 }
      tk.sliding(2).filter(_.length == 2).foreach { bg =>
        val k = (bg(0), bg(1))
        pair(k) = pair.getOrElse(k, 0L) + 1
      }
    }
    val exp = pair.toSeq
      .filter(_._2 >= 3)
      .map { case ((w1, w2), c) =>
        val (a, b) = (uni(w1), uni(w2))
        (w1, w2, c, a, b, (n * c * 1000000L) / (a * b))
      }
      .sortBy { case (w1, w2, _, _, _, q) => (-q, w1, w2) }
      .take(50)
    val got = TextAnalysis.pmiCollocations(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    got.toSeq shouldBe exp
    // non-vacuous: real collocations exist and beat independence
    got.length should be > 0
    got.head._6 should be > 1000000L
  }

  test("t28: TextRank ranks match a sequential weighted PageRank") {
    // undirected weighted co-occurrence graph from adjacent tokens
    val w = scala.collection.mutable.Map.empty[(String, String), Long]
    docTokens.foreach { tk =>
      tk.sliding(2).filter(_.length == 2).foreach { bg =>
        if (bg(0) != bg(1)) {
          val k = if (bg(0) < bg(1)) (bg(0), bg(1)) else (bg(1), bg(0))
          w(k) = w.getOrElse(k, 0L) + 1
        }
      }
    }
    val nbrs = scala.collection.mutable.Map.empty[String, List[(String, Long)]]
    w.foreach { case ((a, b), c) =>
      nbrs(a) = (b, c) :: nbrs.getOrElse(a, Nil)
      nbrs(b) = (a, c) :: nbrs.getOrElse(b, Nil)
    }
    val strength = nbrs.map { case (v, es) => v -> es.map(_._2).sum }
    var pr: Map[String, Long] = nbrs.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[String, Long]
      nbrs.foreach { case (src, es) =>
        es.foreach { case (dst, ew) =>
          in(dst) = in.getOrElse(dst, 0L) + (pr(src) * ew) / strength(src)
        }
      }
      pr = nbrs.keys.map(v => v -> (150000L + (85L * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    val exp = pr.toSeq.map { case (v, p) => (v, p, strength(v)) }
      .sortBy { case (v, p, _) => (-p, v) }
      .take(30)
    val got = TextAnalysis.textRankKeywords(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldBe exp
    // non-vacuous: ranks genuinely differentiate (not all the floor)
    got.length should be > 0
    got.head._2 should be > 150000L
  }

  test("t29: stupid-backoff scores match a sequential recompute; " +
    "every backoff level genuinely fires") {
    val byDoc = docTokensById
    val ref = byDoc.filter(_._1 % 2 == 0).map(_._2)
    val c1 = scala.collection.mutable.Map.empty[String, Long]
    val c2 = scala.collection.mutable.Map.empty[String, Long]
    val c3 = scala.collection.mutable.Map.empty[String, Long]
    var nref = 0L
    ref.foreach { tk =>
      tk.foreach { w => c1(w) = c1.getOrElse(w, 0L) + 1; nref += 1 }
      tk.sliding(2).filter(_.length == 2).foreach { g =>
        val k = g.mkString(" "); c2(k) = c2.getOrElse(k, 0L) + 1
      }
      tk.sliding(3).filter(_.length == 3).foreach { g =>
        val k = g.mkString(" "); c3(k) = c3.getOrElse(k, 0L) + 1
      }
    }
    var (hitTri, hitBig, hitUni, hitOov) = (0L, 0L, 0L, 0L)
    val exp = byDoc.flatMap { case (id, tk) =>
      val qps = tk.sliding(3).filter(_.length == 3).map { g =>
        val (a, b, c) = (g(0), g(1), g(2))
        val tri = c3.get(s"$a $b $c")
        if (tri.isDefined) {
          hitTri += 1; (tri.get * 1000000000L) / c2(s"$a $b")
        } else c2.get(s"$b $c") match {
          case Some(bc) => hitBig += 1; (bc * 2000000000L) / (5L * c1(b))
          case None => c1.get(c) match {
            case Some(uc) => hitUni += 1; (uc * 4000000000L) / (25L * nref)
            case None => hitOov += 1; 0L
          }
        }
      }.toSeq
      if (qps.isEmpty) None
      else Some((id, qps.size.toLong, qps.sum, qps.sum / qps.size))
    }.sortBy(_._1)
    val got = TextAnalysis.trigramBackoff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldBe exp.toSeq
    // the cross-corpus split makes every branch real
    hitTri should be > 0L
    hitBig should be > 0L
    hitUni should be > 0L
  }

  test("t30: span corruption matches a sequential replay; interleaving " +
    "corrupted with targets reconstructs every original document") {
    def h(doc: Long, s: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"sc0:$doc:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    val exp = docTokensById.filter(_._2.nonEmpty).map { case (id, tks) =>
      val fired = tks.indices.map(p => p / 3 * 3).distinct
        .filter(s => h(id, s) % 4 == 0)
        .map(s => s -> (1 + (h(id, s) / 4) % 3).toInt)
      val idxOf = fired.map(_._1).zipWithIndex.toMap
      val maskedPos = fired.flatMap { case (s, len) =>
        s until math.min(s + len, tks.length)
      }.toSet
      val corrupted = tks.indices.flatMap { p =>
        if (!maskedPos(p)) Some(tks(p))
        else if (idxOf.contains(p)) Some(s"<X${idxOf(p)}>")
        else None
      }.mkString(" ")
      val targets = fired.map { case (s, len) =>
        s"<X${idxOf(s)}> " +
          (s until math.min(s + len, tks.length)).map(tks).mkString(" ")
      }.mkString(" ")
      (id, tks.length.toLong, fired.size.toLong, corrupted, targets)
    }.sortBy(_._1)
    val got = TextAnalysis.spanCorrupt(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4))).toSeq
    got shouldBe exp
    // the denoising round-trip: substituting each sentinel's target
    // span back into the corrupted stream recovers the original
    val origById = docTokensById.toMap
    val sentinel = "<X(\\d+)>".r
    for ((id, _, nSpans, corr, tgt) <- got) {
      val chunks = sentinel.split(tgt).drop(1).map(_.trim)
      chunks.length.toLong shouldBe nSpans
      val rebuilt = corr.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(i) => chunks(i.toInt).split(" ")
        case tok => Array(tok)
      }
      withClue(s"doc $id: ") { rebuilt.toSeq shouldBe origById(id).toSeq }
    }
    // non-vacuous across the corpus: multi-sentinel docs, multi-token
    // spans, and untouched docs all occur
    got.count(_._3 >= 2) should be > 0
    got.exists { case (_, _, n, _, tgt) =>
      n > 0 && sentinel.split(tgt).drop(1).exists(_.trim.split(" ").length > 1)
    } shouldBe true
    got.count(_._3 == 0) should be > 0
    // the seed is live: a different epoch seed changes the schedule
    val other = TextAnalysis.spanCorrupt(spark, sf, seed = "sc1").collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    got.exists { case (id, _, _, corr, _) => other(id) != corr } shouldBe true
  }

  test("t31: RAKE top-3 matches a sequential degree/freq recompute") {
    val stop = TextAnalysis.Stopwords.toSet
    val exp = docTokensById.flatMap { case (id, tk) =>
      // phrases: maximal stopword-free runs, keyed by the running
      // stopword count before/at the token (the pid convention)
      val phrases = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.ArrayBuffer[String]]
      var pid = 0L
      tk.foreach { t =>
        if (stop(t)) pid += 1
        else phrases.getOrElseUpdate(pid,
          scala.collection.mutable.ArrayBuffer.empty) += t
      }
      val freq = scala.collection.mutable.Map.empty[String, Long]
      val degree = scala.collection.mutable.Map.empty[String, Long]
      phrases.values.foreach { p =>
        p.foreach { w =>
          freq(w) = freq.getOrElse(w, 0L) + 1
          degree(w) = degree.getOrElse(w, 0L) + p.length
        }
      }
      val scored = phrases.toSeq.map { case (p, ws) =>
        (p, ws.mkString(" "), ws.map(w => degree(w) * 1000000L / freq(w)).sum)
      }
      scored.sortBy { case (p, phrase, score) => (-score, phrase, p) }
        .take(3).zipWithIndex
        .map { case ((_, phrase, score), r) => (id, r + 1, phrase, score) }
    }.toSet
    val got = TextAnalysis.rakeKeywords(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    got shouldBe exp
    graft.Caches.releaseAll(spark)
  }

  test("t32: the vocab growth curve matches a sequential prefix replay " +
    "and is monotone with the full corpus at the top") {
    val maxId = docTokensById.map(_._1).max + 1
    val exp = (1 to 10).map { k =>
      val thr = k * maxId / 10
      val in = docTokensById.filter(_._1 < thr)
      (k, in.size.toLong, in.map(_._2.length.toLong).sum,
        in.flatMap(_._2).toSet.size.toLong)
    }
    val got = TextAnalysis.vocabGrowth(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe exp
    // all three measures grow monotonically with the prefix
    got.zip(got.drop(1)).foreach { case (a, b) =>
      a._2 should be <= b._2
      a._3 should be <= b._3
      a._4 should be <= b._4
    }
    // the last decile is the whole corpus; vocab never exceeds tokens
    got.last._2 shouldBe docTokensById.size.toLong
    got.foreach { case (_, _, nt, v) => v should be <= nt }
    graft.Caches.releaseAll(spark)
  }
}
