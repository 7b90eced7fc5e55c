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
}
