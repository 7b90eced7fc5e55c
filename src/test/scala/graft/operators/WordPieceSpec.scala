package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}
import graft.functions.Text

/** t33 WordPiece: the distributed greedy longest-match segmentation
  * against an independent sequential reference — vocab learning AND
  * the per-word greedy loop both recomputed driver-side from scratch.
  */
class WordPieceSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def referenceEncode(words: Seq[String], topGrams: Int)
      : (Set[String], Map[String, Seq[String]]) = {
    val singles = words.flatMap(_.map(_.toString)).toSet
    val gramCnt = words.flatMap { w =>
      (2 to 3).flatMap(n => (0 to w.length - n).map(i => w.substring(i, i + n)))
    }.groupBy(identity).map { case (g, o) => g -> o.length }
    val top = gramCnt.toSeq.sortBy { case (g, c) => (-c, g) }
      .take(topGrams).map(_._1).toSet
    val vocab = singles ++ top
    def encode(w: String): Seq[String] = {
      var off = 0
      val out = Seq.newBuilder[String]
      while (off < w.length) {
        // greedy: longest vocab entry matching at off
        val len = (math.min(3, w.length - off) to 1 by -1)
          .find(l => vocab.contains(w.substring(off, off + l))).get
        val piece = w.substring(off, off + len)
        out += (if (off == 0) piece else "##" + piece)
        off += len
      }
      out.result()
    }
    (vocab, words.map(w => w -> encode(w)).toMap)
  }

  test("t33: segmentation matches a sequential greedy reference and " +
      "pieces reconstruct every word") {
    import spark.implicits._
    val words = Tables.documents(spark, sf)
      .select(explode(Text.toks($"text")).as("word"))
      .filter(org.apache.spark.sql.functions.length($"word").between(1, 12))
      .distinct().as[String].collect().toSeq
    words should not be empty
    val (_, expect) = referenceEncode(words, topGrams = 50)
    val got = TextAnalysis.wordPieceEncode(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val byWord = got.groupBy(_._1).map { case (w, rows) =>
      w -> rows.sortBy(_._2).map(_._3).toSeq
    }
    byWord.keySet shouldBe words.toSet
    for (w <- words) withClue(s"word $w: ") {
      byWord(w) shouldBe expect(w)
      // positions are 1..n with no gaps (one piece per round)
      got.filter(_._1 == w).map(_._2).sorted shouldBe
        (1 to byWord(w).length)
      // reconstruction: stripping ## and concatenating yields the word
      byWord(w).map(_.stripPrefix("##")).mkString shouldBe w
    }
    // the learned grams are live: some word really segments into a
    // multi-char piece (not all-singles)
    byWord.values.flatten.count(p => p.stripPrefix("##").length > 1) should be > 0
  }

  test("t33: greedy really prefers the longest match (synthetic pin)") {
    // reference semantics on a hand vocab: "abc" must win over "ab"
    val (vocab, enc) = referenceEncode(Seq("abcabc", "abc", "ab"), 50)
    vocab should contain("abc")
    enc("abcabc") shouldBe Seq("abc", "##abc")
  }
}
