package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Correctness weight for the rows-only t21 gate entry: the
  * distributed BPE learner is proven merge-for-merge equal to an
  * independent sequential reference (Sennrich et al. 2016 alg.),
  * encode provably replays training, and the gated per-doc counts are
  * recomputed from raw text.
  */
class BpeSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Sequential single-machine reference learner over a word-frequency
    * map — independent of the distributed code paths (its own merge
    * application inline).
    */
  private def seqLearn(wc: Map[String, Long], k: Int): Seq[(String, String)] = {
    def applyMerge(s: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          b += s(i) + s(i + 1); i += 2
        } else { b += s(i); i += 1 }
      }
      b.result()
    }
    var words: Seq[(Vector[String], Long)] =
      wc.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- words; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        words = words.map { case (s, c) => (applyMerge(s, best._1, best._2), c) }
      }
    }
    out.toSeq
  }

  /** The reference's final symbolization of every training word after
    * all k merges (for the encode-replays-training assertion).
    */
  private def seqTrainSymbols(wc: Map[String, Long],
      merges: Seq[(String, String)]): Map[String, Seq[String]] =
    wc.keys.map { w =>
      var s: Seq[String] = w.map(_.toString)
      merges.foreach { case (l, r) => s = Bpe.applyMergeOnce(s, l, r) }
      w -> s
    }.toMap

  /** Mirror of Text.toks for driver-side recomputation. */
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  test("applyMergeOnce: leftmost-first, non-overlapping, exact pair match") {
    Bpe.applyMergeOnce(Seq("a", "a", "a"), "a", "a") shouldBe Seq("aa", "a")
    Bpe.applyMergeOnce(Seq("a", "b", "a", "b"), "a", "b") shouldBe Seq("ab", "ab")
    Bpe.applyMergeOnce(Seq("x", "y"), "a", "b") shouldBe Seq("x", "y")
    Bpe.applyMergeOnce(Seq("ab", "c", "ab", "c"), "ab", "c") shouldBe
      Seq("abc", "abc")
    Bpe.applyMergeOnce(Seq.empty, "a", "b") shouldBe Seq.empty
  }

  test("learnMerges == sequential reference on a tie-heavy hand corpus") {
    import spark.implicits._
    // "ab" vs "ba" pair counts tie at round 1 → lexicographic
    // tie-break must pick (a,b); later rounds exercise merged-symbol
    // pairs ((ab,c) etc.)
    val wc = Map("abc" -> 3L, "bac" -> 3L, "abab" -> 1L, "baba" -> 1L,
      "cc" -> 2L, "a" -> 5L)
    val df = wc.toSeq.toDF("word", "wcount")
    val got = Bpe.learnMerges(df, numMerges = 8).map(m => (m.left, m.right))
    got shouldBe seqLearn(wc, 8)
    // early exit: asking for far more merges than pairs exist
    val tiny = Seq(("ab", 1L)).toDF("word", "wcount")
    val m = Bpe.learnMerges(tiny, numMerges = 50)
    m.map(x => (x.left, x.right)) shouldBe Seq(("a", "b"))
  }

  test("learnMerges == sequential reference on real sf0.001 word counts") {
    val wcDf = Bpe.wordCounts(graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val wc = wcDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.learnMerges(wcDf, numMerges = 12).map(m => (m.left, m.right))
    got shouldBe seqLearn(wc, 12)
  }

  test("encodeWord replays training exactly (rank order + golden)") {
    val wc = Map("lower" -> 4L, "lowest" -> 2L, "newer" -> 6L, "wider" -> 3L)
    val merges = seqLearn(wc, 10)
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val trained = seqTrainSymbols(wc, merges)
    wc.keys.foreach { w =>
      withClue(s"word $w: ") { Bpe.encodeWord(w, ranks) shouldBe trained(w) }
    }
    // unseen words segment to GOLDEN literals: the 10 merges learned
    // from this corpus are (e,r),(w,er),(e,wer),(l,o),(n,ewer),
    // (lo,wer),(d,er),(i,der),(w,ider),(e,s) — so "low" applies only
    // rank-3 (l,o) ((lo,w) was never learned), and "slower" walks the
    // rank ladder er→wer→lo→lower
    merges shouldBe Seq(("e", "r"), ("w", "er"), ("e", "wer"), ("l", "o"),
      ("n", "ewer"), ("lo", "wer"), ("d", "er"), ("i", "der"),
      ("w", "ider"), ("e", "s"))
    Bpe.encodeWord("low", ranks) shouldBe Seq("lo", "w")
    Bpe.encodeWord("slower", ranks) shouldBe Seq("s", "lower")
    Bpe.encodeWord("", ranks) shouldBe Seq.empty
    Bpe.encodeWord("z", Map.empty) shouldBe Seq("z")
  }

  test("learnMerges with a reliable checkpoint dir: identical merges") {
    import spark.implicits._
    val wc = Map("abc" -> 3L, "bac" -> 3L, "abab" -> 1L, "cc" -> 2L)
    val df = wc.toSeq.toDF("word", "wcount")
    val dir = java.nio.file.Files.createTempDirectory("bpe-ckpt").toString
    try {
      val reliable = Bpe.learnMerges(df, numMerges = 6,
        checkpointDir = Some(dir))
      val local = Bpe.learnMerges(df, numMerges = 6)
      reliable shouldBe local
      reliable.map(m => (m.left, m.right)) shouldBe seqLearn(wc, 6)
      // the reliable path actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "expected reliable checkpoint files on disk")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("t22 gate output: learned merge table == sequential reference") {
    val sf = "/root/testdata/sf0.001"
    val wc = Bpe.wordCounts(graft.Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.learnedMerges(spark, sf, numMerges = 12).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    got.map(_._1).toSeq shouldBe (0 until 12)
    got.map(x => (x._2, x._3)).toSeq shouldBe seqLearn(wc, 12)
  }

  test("t21 gate output: per-doc counts recomputed from raw text") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val wc = Bpe.wordCounts(graft.Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ranks = seqLearn(wc, 12).zipWithIndex
      .map { case (p, i) => p -> i }.toMap
    val got = Bpe.tokenStats(spark, sf, numMerges = 12).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    got.keySet shouldBe docs.keySet
    docs.foreach { case (id, text) =>
      val tk = toks(text)
      val expect = (tk.length.toLong,
        tk.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum)
      withClue(s"doc $id: ") { got(id) shouldBe expect }
    }
  }
}
