package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.IntLog

/** Correctness weight behind the t44/t45 hash gates, BpeSpec-style:
  * the fixed-point integer log2 is pinned Column==reference and
  * within 0.01 of the real log2; the Viterbi DP is proven optimal
  * against exhaustive segmentation enumeration (a structurally
  * independent oracle); and the whole distributed trainer is proven
  * vocab-for-vocab equal to a sequential reference that segments by
  * brute force.
  */
class UnigramSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Mirror of Text.toks for driver-side recomputation. */
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** Every segmentation of `w` into pieces of length <= MaxPieceLen —
    * the exhaustive oracle the DP must match.
    */
  private def allSegs(w: String): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(Unigram.MaxPieceLen, w.length)).flatMap { n =>
      allSegs(w.substring(n)).map(w.substring(0, n) :: _)
    }

  /** Brute-force best segmentation under the house total order
    * (cost, piece count, '|'-joined path) — independent of the DP.
    */
  private def bruteBest(w: String, cost: Map[String, Long]): List[String] =
    allSegs(w).filter(_.forall(cost.contains))
      .map(seg => (seg.map(cost).sum, seg.length, seg.mkString("|"), seg))
      .minBy(x => (x._1, x._2, x._3))._4

  /** Sequential single-machine reference of the WHOLE training loop —
    * seed substring frequencies, hard-EM rounds with brute-force
    * segmentation, floor-1 singles, prune schedule. Shares only the
    * [[IntLog.log2FixedRef]] grid (whose own correctness is pinned
    * separately below).
    */
  private def seqTrain(wcAll: Map[String, Long]): Seq[(String, Long)] = {
    val wc = wcAll.filter(_._1.length <= Unigram.MaxWordLen)
    val freq = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((w, c) <- wc; i <- 0 until w.length;
        n <- 1 to math.min(Unigram.MaxPieceLen, w.length - i))
      freq(w.substring(i, i + n)) += c
    val singles = freq.keys.filter(_.length == 1).toSeq.sorted
    val seedMultis = freq.toSeq.filter(_._1.length >= 2)
      .sortBy { case (p, f) => (-f, p) }.take(Unigram.SeedMultis)
    var vocab: Map[String, Long] =
      (singles.map(p => p -> freq(p)) ++ seedMultis).toMap
    for (keep <- Unigram.KeepSchedule) {
      val t = vocab.values.sum
      val lt = IntLog.log2FixedRef(t)
      val cost = vocab.map { case (p, f) =>
        p -> (lt - IntLog.log2FixedRef(f))
      }
      val usage = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for ((w, c) <- wc; p <- bruteBest(w, cost)) usage(p) += c
      val nextSingles =
        singles.map(p => p -> math.max(usage(p), 1L))
      val nextMultis = usage.toSeq
        .filter { case (p, u) => p.length >= 2 && u > 0 }
        .sortBy { case (p, u) => (-u, p) }.take(keep)
      vocab = (nextSingles ++ nextMultis).toMap
    }
    vocab.toSeq.sortBy(_._1)
  }

  test("log2Fixed: Column == driver reference on edge and random values") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val edge = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 1023L, 1024L, 1025L,
      (1L << 30) - 1, 1L << 30, (1L << 30) + 1, (1L << 61),
      (1L << 62) - 1)
    val rand = Seq.fill(500)(1L + (rng.nextLong().abs % ((1L << 62) - 1)))
    val vals = edge ++ rand
    val got = vals.toDF("n")
      .select(IntLog.log2Fixed(col("n")).as("r")).collect().map(_.getLong(0))
    got.toSeq shouldBe vals.map(IntLog.log2FixedRef)
  }

  test("log2Fixed is a real log2: within 0.01 of math.log on its grid") {
    val rng = new scala.util.Random(7)
    val vals = (1L to 1000L) ++ Seq.fill(500)(
      1L + (rng.nextLong().abs % ((1L << 62) - 1)))
    for (n <- vals) {
      val approx = IntLog.log2FixedRef(n).toDouble / (1 << IntLog.F)
      val real = math.log(n.toDouble) / math.log(2.0)
      math.abs(approx - real) should be < 0.01
    }
    // exact on powers of two (zero fractional truncation)
    for (k <- 0 to 61)
      IntLog.log2FixedRef(1L << k) shouldBe (k.toLong << IntLog.F)
  }

  test("viterbi == brute-force enumeration, including tie-breaks") {
    // hand costs engineered for ties: equal-cost competing splits must
    // resolve by (np, then path string) exactly as enumeration does
    val cost = Map("a" -> 10L, "b" -> 10L, "c" -> 10L, "ab" -> 20L,
      "bc" -> 20L, "abc" -> 35L, "aa" -> 15L, "aab" -> 25L)
    for (w <- Seq("a", "ab", "abc", "aab", "aabc", "abab", "aaabc",
        "cab", "baabcab")) {
      Unigram.viterbi(w, cost) shouldBe bruteBest(w, cost)
      Unigram.viterbi(w, cost).mkString("") shouldBe w
    }
    // singles-only coverage still segments everything
    val singlesOnly = Map("x" -> 1L, "y" -> 2L)
    Unigram.viterbi("xyxy", singlesOnly) shouldBe List("x", "y", "x", "y")
  }

  test("train == sequential brute-force reference on real sf0.001 words") {
    import spark.implicits._
    val wc = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect()
      .flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Unigram.train(spark, "/root/testdata/sf0.001")
    got shouldBe seqTrain(wc)
    // every corpus character survives training (no [UNK] by construction)
    val chars = wc.keys.flatMap(_.toSeq).map(_.toString).toSet
    got.map(_._1).filter(_.length == 1).toSet shouldBe chars
  }

  test("t45 encode table: contiguous positions, pieces rebuild the word, " +
      "segmentation == brute force under the final costs") {
    val sf = "/root/testdata/sf0.001"
    val cost = Unigram.costsOf(Unigram.train(spark, sf))
    val rows = Unigram.encodeTable(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val byWord = rows.groupBy(_._1)
    byWord should not be empty
    for ((w, ps) <- byWord) withClue(s"word $w: ") {
      ps.map(_._2).sorted.toSeq shouldBe (1 to ps.length)
      ps.sortBy(_._2).map(_._3).mkString("") shouldBe w
      ps.sortBy(_._2).map(_._3).toList shouldBe bruteBest(w, cost)
    }
  }
}
