package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** d18 span scrub: the removal half of the substring-dedup pass. */
class SpanScrubSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("planted unaligned repeat: non-keeper loses exactly the shared span, keeper keeps all") {
    import spark.implicits._
    val s20 = (1 to 20).map(i => s"shared$i")
    val a = (Seq("ja1", "ja2", "ja3") ++ s20 ++ Seq("taila")).mkString(" ")
    val b = (Seq("jb1", "jb2") ++ s20 ++ Seq("tb1", "tb2")).mkString(" ")
    val out = Dedup.spanScrubCore(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"), window = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 is min_doc of the shared span: untouched, whitespace-normalized
    out(1L) shouldBe ((24L, 0L, a))
    // doc 2 loses the 20 shared tokens, keeps its junk + tail
    out(2L)._1 shouldBe 24L
    out(2L)._2 shouldBe 20L
    out(2L)._3 shouldBe "jb1 jb2 tb1 tb2"
  }

  test("conservation on the real corpus: removed + surviving == original tokens") {
    val rows = Dedup.spanScrub(spark, sf).collect()
    rows.length.toLong shouldBe Tables.documents(spark, sf)
      .filter(graft.functions.Text.tokenCount(col("text")) > 0).count()
    var removedTotal = 0L
    rows.foreach { r =>
      val (n, rem, clean) = (r.getLong(1), r.getLong(2), r.getString(3))
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      withClue(s"doc ${r.getLong(0)}: ") { kept.toLong shouldBe n - rem }
      removedTotal += rem
    }
    // the sf0.01 corpus carries planted exact dups — something must scrub
    removedTotal should be > 0L
  }

  test("untouched docs reassemble to their whitespace-normalized text exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val clean = Dedup.spanScrub(spark, sf).filter($"n_removed" === 0)
      .select($"doc_id", $"clean")
    val joined = clean.join(docs, "doc_id")
      .select($"doc_id", $"clean",
        array_join(graft.functions.Text.toks($"text"), " ").as("norm"))
      .collect()
    joined should not be empty
    joined.foreach { r =>
      withClue(s"doc ${r.getLong(0)}: ") {
        r.getString(1) shouldBe r.getString(2)
      }
    }
  }

  test("spanScrubCached == plan-only spanScrub, and the spans frame is registered for release") {
    val scope = graft.Caches.scope()
    try {
      val cached = Dedup.spanScrubCached(spark, sf).collect()
      // the materialized spans frame landed in the open scope
      scope.size should be >= 1
      val plain = Dedup.spanScrub(spark, sf).collect()
      cached.map(_.toSeq).toSeq shouldBe plain.map(_.toSeq).toSeq
    } finally scope.release()
  }
}
