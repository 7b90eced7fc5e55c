package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** d10 passage-level dedup: sub-document windows shared across
  * documents — the boilerplate catch document-level dedup cannot see.
  */
class PassageDedupSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("output rows are cross-document repeats with consistent counts") {
    val rows = Dedup.passageDedup(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getLong(r.fieldIndex("n_docs")) should be >= 2L
      r.getLong(r.fieldIndex("n_occ")) should be >=
        r.getLong(r.fieldIndex("n_docs"))
    }
  }

  test("exact-duplicate documents share every full passage window") {
    // every full 20-token window of a doc with >= 2 exact copies exists
    // in >= 2 docs by construction — all of them must be reported.
    // sf0.1: the only scale with planted exact duplicates (8 groups)
    val sf = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, sf)
    val dupKeeps = Dedup.exact(spark, sf).filter(col("n_copies") >= 2)
      .join(docs, col("keep_id") === col("doc_id"))
      .select(col("doc_id"), col("text"))
    val tk = graft.functions.Text.tokenized(dupKeeps, "doc_id", "text")
    val expected = tk
      .select(explode(Dedup.passageHashes(col("tk"), 20)).as("ph"))
      .collect().map(_.getString(0)).toSet
    expected should not be empty
    val reported = Dedup.passageDedup(spark, sf)
      .collect().map(_.getString(0)).toSet
    withClue("windows of exact-dup docs missing from passageDedup: ") {
      (expected -- reported) shouldBe empty
    }
    graft.Caches.releaseAll(spark)
  }

  // ---- d17 repeatedSpans (stride-1, the Lee et al. substring pass) ----

  test("spanHashes catches an UNALIGNED shared substring that passageHashes misses") {
    import spark.implicits._
    // shared 20-token substring S; doc A prefixes 3 junk tokens, doc B 7
    // — S never starts on a 20-token boundary in either doc, so aligned
    // windows cannot agree, stride-1 windows must
    val s20 = (1 to 20).map(i => s"shared$i")
    val a = (Seq("ja1", "ja2", "ja3") ++ s20).mkString(" ")
    val b = (Seq("jb1", "jb2", "jb3", "jb4", "jb5", "jb6", "jb7") ++ s20).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val tk = graft.functions.Text.tokenized(docs, "doc_id", "text")
    def hashesOf(col: org.apache.spark.sql.Column) = tk
      .select($"doc_id", explode(col).as("ph"))
      .groupBy($"ph").agg(count_distinct($"doc_id").as("n"))
      .filter($"n" >= 2).count()
    hashesOf(Dedup.passageHashes($"tk", 20)) shouldBe 0L
    hashesOf(Dedup.spanHashes($"tk", 20)) should be >= 1L
  }

  test("per-doc span count is exactly max(0, tokens - window + 1)") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 25).map("t" + _).mkString(" ")), // 25 tokens -> 6 spans
      (2L, (1 to 20).map("t" + _).mkString(" ")), // exactly one window
      (3L, (1 to 19).map("t" + _).mkString(" ")), // under a window -> 0
      (4L, "")).toDF("doc_id", "text")
    val sh = Dedup.spanHashes(col("tk"), 20)
    val n = graft.functions.Text.tokenized(docs, "doc_id", "text")
      .select(col("doc_id"), org.apache.spark.sql.functions.size(sh).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    n shouldBe Map(1L -> 6, 2L -> 1, 3L -> 0, 4L -> 0)
  }

  test("repeatedSpans is a superset of passageDedup's aligned findings") {
    // every boundary-aligned repeat is in particular a stride-1 repeat:
    // d10's hash set must be contained in d17's on the same corpus —
    // and d17 must find strictly more on the planted-dup scale
    val sf01 = "/root/testdata/sf0.01"
    val aligned = Dedup.passageDedup(spark, sf01)
      .collect().map(_.getString(0)).toSet
    val spans = Dedup.repeatedSpans(spark, sf01)
      .collect().map(_.getString(0)).toSet
    aligned should not be empty
    withClue("aligned repeats missing from repeatedSpans: ") {
      (aligned -- spans) shouldBe empty
    }
    spans.size should be > aligned.size
  }
}
