package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** d34 winnowing — independent replay of the Schleimer et al. selection
  * rule plus the paper's detection guarantee on constructed docs.
  */
class WinnowSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val M = 1L << 20

  private def md5hex8(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16)

  /** Reference winnow: windows of w over k-gram hashes, min with
    * rightmost tiebreak, distinct (pos, h).
    */
  private def winnowRef(text: String, k: Int = 3, w: Int = 4): Set[(Long, Long)] = {
    val tk = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val grams = tk.sliding(k).filter(_.length == k).map(_.mkString(" ")).toVector
    val hs = grams.zipWithIndex.map { case (g, i) => (i + 1L, md5hex8(g)) }
    (0 to hs.length - w).flatMap { j =>
      val win = hs.slice(j, j + w)
      // min hash, rightmost position on ties
      Some(win.minBy { case (pos, h) => (h, -pos) })
    }.toSet.map { t: (Long, Long) => (t._1, t._2) }
  }

  test("fingerprints replay an independent winnow over the corpus") {
    val sf = "/root/testdata/sf0.001"
    val got = Dedup.winnowFingerprints(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    got should not be empty
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) =>
      val exp = winnowRef(text)
      withClue(s"doc $id: ") {
        got.getOrElse(id, Set.empty[(Long, Long)]) shouldBe exp
      }
    }
    // density sanity: never more than one fingerprint per window, and
    // genuinely fewer than the gram count (the sketch compresses)
    got.foreach { case (id, fps) =>
      val n = docs(id).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty) - 2
      if (n >= 4) {
        fps.size should be <= (n - 3)
        fps.size should be < n
      }
    }
  }

  test("guarantee: a shared run of w+k-1 tokens yields a shared fingerprint") {
    import spark.implicits._
    // two otherwise-different docs sharing exactly one 6-token run
    val shared = "zeta eta theta iota kappa lambda"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon omega psi chi phi"),
      (2L, s"one two three four five $shared six seven eight nine ten"))
      .toDF("doc_id", "text")
    // reuse the operator body via a temp view-free path: same pipeline
    // over a frame (winnowFingerprints reads the table, so replay the
    // reference on both and intersect — the guarantee is a property of
    // the RULE, proven on the reference the corpus test tied to the op)
    val f1 = winnowRef(docs.collect()(0).getString(1))
    val f2 = winnowRef(docs.collect()(1).getString(1))
    f1.map(_._2).intersect(f2.map(_._2)) should not be empty
    // and winnowPairs surfaces it from fingerprint tables
    val fp = (f1.map { case (p, h) => (1L, p, h) } ++
      f2.map { case (p, h) => (2L, p, h) }).toSeq.toDF("doc_id", "pos", "h")
    val pairs = Dedup.winnowPairs(fp, minShared = 1).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) should contain((1L, 2L))
  }

  test("bbitMinHash: estimators recompute from signatures; laws hold") {
    val sf = "/root/testdata/sf0.01"
    val rows = Dedup.bbitMinHash(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // independent signature rebuild via the shared internal helpers
    val sh = Dedup.shingleSet(spark, sf, Some(10))
    val sigs = Dedup.signatures(sh.join(Dedup.shingleDict(sh), "sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    graft.Caches.releaseAll(spark)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (sigs(a), sigs(b))
      val eqFull = sa.zip(sb).count { case (p, q) => p == q }.toLong
      val eqB = sa.zip(sb).count { case (p, q) => p % 4 == q % 4 }.toLong
      withClue(s"pair ($a,$b): ") {
        r.getLong(2) shouldBe eqFull
        r.getLong(3) shouldBe eqB
        // low bits can only ADD collisions, never remove matches
        eqB should be >= eqFull
        r.getLong(4) shouldBe eqFull * 1000000L / 16
        r.getLong(5) shouldBe math.max(0L, (4 * eqB - 16) * 1000000L / 48)
        // a fully-matching signature is a fixed point of the correction
        if (eqFull == 16) r.getLong(5) shouldBe 1000000L
      }
    }
  }
}
