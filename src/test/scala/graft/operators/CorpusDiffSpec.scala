package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** d19 corpus diff: content-hash membership semantics. */
class CorpusDiffSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("planted snapshots: added/removed/retained by content, per language, id-blind") {
    import spark.implicits._
    // old: A, B (en), X (de). new: B re-crawled under a NEW id, C new,
    // C duplicated (distinct must collapse it), X unchanged (de).
    val old = Seq((1L, "en", "docA"), (2L, "en", "docB"), (3L, "de", "docX"))
      .toDF("doc_id", "lang", "text")
    val nw = Seq((10L, "en", "docB"), (11L, "en", "docC"),
      (12L, "en", "docC"), (13L, "de", "docX"))
      .toDF("doc_id", "lang", "text")
    val out = Dedup.corpusDiffFrames(old, nw).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out shouldBe Map("en" -> ((1L, 1L, 1L)), "de" -> ((0L, 0L, 1L)))
  }

  test("gate-shape totals: every distinct content lands in exactly one bucket") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val rows = Dedup.corpusDiff(spark, sf).collect()
    rows should not be empty
    val docs = graft.Tables.documents(spark, sf)
    val oldD = docs.filter($"doc_id" % 2 === 0)
      .select($"lang", org.apache.spark.sql.functions.md5($"text".cast("binary")))
      .distinct().count()
    val newD = docs.filter($"doc_id" % 2 === 1)
      .select($"lang", org.apache.spark.sql.functions.md5($"text".cast("binary")))
      .distinct().count()
    val (added, removed, retained) = (rows.map(_.getLong(1)).sum,
      rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    removed + retained shouldBe oldD
    added + retained shouldBe newD
  }

  test("sourceOverlap: planted shared shingles give exact jaccard and containment") {
    import spark.implicits._
    // shingle sets: A = {abc, bcd}; B = {abc, bcx}; C = {abc, bcd, cde}
    // (A is a strict subset of C — the case containment catches and
    // jaccard understates)
    val docs = Seq(("A", "a b c d"), ("B", "a b c x"), ("C", "a b c d e"))
      .toDF("source", "text")
    val got = Dedup.sourceOverlapOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    got(("A", "B")) shouldBe ((1L, 0.333333, 0.5))
    got(("A", "C")) shouldBe ((2L, 0.666667, 1.0))
    got(("B", "C")) shouldBe ((1L, 0.25, 0.5))
    got.size shouldBe 3
    graft.Caches.releaseAll(spark)
  }

  test("sourceOverlap gate shape: sparse matrix, jaccard <= containment <= 1") {
    val rows = Dedup.sourceOverlap(spark, "/root/testdata/sf0.01").collect()
    rows should not be empty
    rows.length should be <= (20 * 19) / 2 // at most C(#sources, 2) pairs
    rows.foreach { r =>
      val (j, c) = (r.getDouble(3), r.getDouble(4))
      j should be <= c
      c should be <= 1.0
      j should be > 0.0
    }
    graft.Caches.releaseAll(spark)
  }
}
