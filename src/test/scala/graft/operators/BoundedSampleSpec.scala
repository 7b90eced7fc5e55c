package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** The two deliberately-quadratic ground-truth queries (d02 exact
  * n-gram Jaccard, d05 exact embedding near-dup) must stay BOUNDED:
  * their sample is fixed-SIZE (id-prefix cap), not fixed-fraction, so
  * the pair count has a corpus-independent ceiling. These specs pin
  * that contract with small caps (the defaults don't bind at test
  * scale — that's the point: the cap exists for the 100 TB corpus).
  */
class BoundedSampleSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("d05 sample is capped at maxSample vectors regardless of corpus size") {
    // cap = 4 → only vec_ids {0, 50, 100, 150} may participate
    val rows = Dedup.embeddingNearDup(spark, sf01, maxSample = 4).collect()
    graft.Caches.releaseAll(spark)
    val ids = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    ids.foreach { id =>
      id % 50 shouldBe 0
      id should be < 200L
    }
    // and the sampled-universe size itself is the analytic bound:
    // vec_id % 50 == 0 AND vec_id < 50*maxSample admits <= maxSample ids
    val n = Tables.embeddings(spark, sf01)
      .filter(col("vec_id") % 50 === 0 && col("vec_id") < 50L * 4).count()
    n should be <= 4L
  }

  test("d02 sample is capped at maxSample docs regardless of corpus size") {
    val sh = Dedup.shingleSet(spark, sf01, Some(10), Some(10L * 7))
    val nDocs = sh.select("doc_id").distinct().count()
    nDocs should be <= 7L
    // operator passthrough: any emitted pair respects the same cap
    val rows = Dedup.ngramJaccard(spark, sf01, maxSample = 7).collect()
    graft.Caches.releaseAll(spark)
    rows.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .foreach(_ should be < 70L)
  }

  test("d14 multi-probe near-dup: superset of d13, hamming<=1 buckets, exact cosines") {
    val sf = "/root/testdata/sf0.001"
    val single = Dedup.embeddingNearDupLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Dedup.embeddingNearDupMultiProbe(spark, sf).collect()
    multi should not be empty
    val multiPairs = multi.map(r => (r.getLong(0), r.getLong(1)))
    // no pair emitted twice (the one-sided probe explode guarantees it)
    multiPairs.length shouldBe multiPairs.distinct.length
    // recall strictly dominates the single-bucket path (superset)
    single.subsetOf(multiPairs.toSet) shouldBe true
    multiPairs.length should be >= single.size
    // every pair's bucket codes differ in at most one plane sign
    multi.foreach { r =>
      val h = Integer.bitCount(
        r.getInt(r.fieldIndex("bucket_a")) ^ r.getInt(r.fieldIndex("bucket_b")))
      h should be <= 1
      r.getDouble(r.fieldIndex("cos")) should be >= 0.2
    }
  }

  test("d13 LSH near-dup: same-bucket pairs only, exact verified cosines") {
    val sf = "/root/testdata/sf0.001"
    val got = Dedup.embeddingNearDupLsh(spark, sf).collect()
    got should not be empty
    // every emitted cosine clears the threshold (precision 1: the
    // verifier is exact) and matches an independent brute-force value
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"))
    val brute = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"),
        round(Similarity.dot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { r =>
      val cos = r.getDouble(r.fieldIndex("cos"))
      cos should be >= 0.2
      cos shouldBe brute((r.getLong(0), r.getLong(1)))
    }
    // and the pairs the LSH path emits are a SUBSET of the exact
    // above-threshold pairs (recall < 1 is the trade; precision is not)
    val exactPairs = brute.filter(_._2 >= 0.2).keySet
    got.map(r => (r.getLong(0), r.getLong(1))).toSet
      .subsetOf(exactPairs) shouldBe true
    // buckets really partition: both members carry the same bucket (the
    // join key survives into the output)
    got.foreach(r => r.getInt(r.fieldIndex("bucket")) should (be >= 0 and be <= 15))
  }

  test("d16 incremental embed overlap: delta-only rows, history-only matches, exact best selection") {
    import spark.implicits._
    val rows = Dedup.incrementalEmbedOverlap(spark, sf01).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"delta vec ${r.getLong(0)}: ") {
        r.getLong(0) % 2 shouldBe 1L // delta = odd ids
        r.getLong(3) % 2 shouldBe 0L // matches come from history (even)
        r.getLong(2) should be >= 1L // n_matches
        r.getDouble(4) should be >= 0.2 // best_cos clears the threshold
      }
    }
    // recompute n_matches and the best match independently: interpreted
    // fold, join built from scratch
    val emb = Tables.embeddings(spark, sf01)
      .select($"vec_id", $"embedding",
        Similarity.norm2Fold($"embedding").as("nrm"),
        Similarity.lshBucket($"embedding", 4, 64).as("bucket"))
    val d = emb.filter($"vec_id" % 2 === 1)
    val h = emb.filter($"vec_id" % 2 === 0)
      .select($"vec_id".as("hid"), $"embedding".as("h_emb"),
        $"nrm".as("h_nrm"), $"bucket")
    val expected = d.join(h, "bucket")
      .select($"vec_id", $"hid",
        round(Similarity.dotFold($"embedding", $"h_emb") /
          sqrt($"nrm" * $"h_nrm"), 6).as("cos"))
      .filter($"cos" >= 0.2)
      .collect().groupBy(_.getLong(0))
      .map { case (id, ps) =>
        val best = ps.minBy(p => (-p.getDouble(2), p.getLong(1)))
        id -> (ps.length.toLong, best.getLong(1), best.getDouble(2))
      }
    rows.length shouldBe expected.size
    rows.foreach { r =>
      withClue(s"delta vec ${r.getLong(0)}: ") {
        (r.getLong(2), r.getLong(3), r.getDouble(4)) shouldBe expected(r.getLong(0))
      }
    }
  }
}
