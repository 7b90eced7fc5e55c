package graft.operators


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The sizing contracts as code (VERDICT r6 #1): the suggestion
  * arithmetic, the generic population guard in both directions, and —
  * per guarded operator — that an undersized configuration fails
  * loudly naming its parameter while the contract-sized default stays
  * silent with unchanged results (the oracle gate re-proves the
  * latter at sf0.01 for all six).
  */
class SizingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("suggestPlanes reproduces the documented s02 example and edges") {
    // 1e10 vectors at ~1e5 per bucket -> planes = 17 (COVERAGE.md)
    Sizing.suggestPlanes(10000000000L, 100000L) shouldBe 17
    // expected population under the suggestion really clears the target
    val p = Sizing.suggestPlanes(10000000000L, 100000L)
    (10000000000L >> p) should be <= 100000L
    Sizing.suggestPlanes(0L) shouldBe 1
    Sizing.suggestPlanes(1L) shouldBe 1
    // power-of-two boundary: corpus exactly target*2^n needs n planes
    Sizing.suggestPlanes(800000L, 100000L) shouldBe 3
    Sizing.suggestPlanes(800001L, 100000L) shouldBe 4
  }

  test("suggestK follows the SemDeDup paper operating point; suggestShards bounds the span") {
    Sizing.suggestK(50000000L) shouldBe 5000 // k = n / 1e4
    Sizing.suggestK(50000001L) shouldBe 5001 // ceil, never under-clustered
    Sizing.suggestK(10L) shouldBe 1
    Sizing.suggestShards(25000000L) shouldBe 3 // ceil(2.5e7 / 1e7)
    Sizing.suggestShards(0L) shouldBe 1
  }

  test("guardKeyPopulation: silent and row-identical within the bound") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "key")
    val guarded = Sizing.guardKeyPopulation(df, "key", 15L, "opX", "bucket", "planes")
    guarded.columns.toSeq shouldBe Seq("id", "key")
    guarded.select($"id").as[Long].collect().sorted shouldBe (1L to 100L).toArray
  }

  test("guardKeyPopulation: null keys are neither dropped nor unguarded") {
    import spark.implicits._
    // 14 null-key rows + 86 spread over 6 keys: a plain equi-join would
    // silently drop the null rows; the null-safe join must keep them
    // under a loose bound and FIRE under a tight one
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k0")
      .select($"id", when($"k0" =!= 0, $"k0").as("key"))
    df.filter($"key".isNull).count() shouldBe 14L
    val kept = Sizing.guardKeyPopulation(df, "key", 20L, "opX", "bucket", "planes")
    kept.count() shouldBe 100L
    val e = intercept[Exception] {
      Sizing.guardKeyPopulation(df, "key", 13L, "opX", "bucket", "planes").collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    msg should include("planes")
  }

  test("guardKeyPopulation: an over-populated key fails naming the parameter and helper") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "key")
    val e = intercept[Exception] {
      Sizing.guardKeyPopulation(df, "key", 14L, "opX", "bucket", "planes").collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    msg should include("opX")
    msg should include("planes")
    msg should include("suggestPlanes")
  }

  // --- per-operator wiring: undersized config fires; default is silent ---

  private def failsNaming(param: String)(body: => Unit): Unit = {
    val e = intercept[Exception](body)
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    msg should include(param)
  }

  test("semDedup guard fires when k is undersized for the bound") {
    failsNaming("`k`") {
      Dedup.semDedup(spark, sf, k = 1, maxCellPop = 10L).collect()
    }
    graft.Caches.releaseAll(spark)
  }

  test("embeddingNearDupLsh / MultiProbe / annLsh guards fire when planes is undersized") {
    failsNaming("`planes`") {
      Dedup.embeddingNearDupLsh(spark, sf, maxBucketPop = 1L).collect()
    }
    failsNaming("`planes`") {
      Dedup.embeddingNearDupMultiProbe(spark, sf, maxBucketPop = 1L).collect()
    }
    failsNaming("`planes`") {
      Similarity.annLsh(spark, sf, maxBucketPop = 1L).collect()
    }
  }

  test("audioNearDup guard fires when frames is undersized; sized default silent") {
    // undersized: any populated (band, bucket) key over the bound fails
    // naming `frames` (the band-space parameter) and suggestFrames
    failsNaming("`frames`") {
      Multimodal.audioNearDup(spark, sf, maxBandPop = 1L).collect()
    }
    graft.Caches.releaseAll(spark)
    // sized: the default bound passes rows through — same pair set as a
    // run with the guard effectively disabled
    val sized = Multimodal.audioNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll(spark)
    val unguarded = Multimodal.audioNearDup(spark, sf, maxBandPop = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll(spark)
    sized shouldBe unguarded
  }

  test("suggestFrames keeps the expected band population under the target") {
    // 3.2M media at the 100k target: 5-bit bands (the m09 default
    // shape) are exactly saturated — suggestFrames holds the floor
    Sizing.suggestFrames(3200000L) shouldBe 16
    // 10x the corpus: one more bit per band hits the ceilLog2 growth
    val f = Sizing.suggestFrames(32000000L)
    f shouldBe 28
    val bandWidth = (f - 1) / 3
    (32000000L >> bandWidth) should be <= Sizing.MaxPairKeyPopulation
    // tiny corpora never shrink below the 16-frame default shape
    Sizing.suggestFrames(100L) shouldBe 16
  }

  test("incrementalEmbedOverlap guard fires on the history side only") {
    failsNaming("`planes`") {
      Dedup.incrementalEmbedOverlap(spark, sf, maxBucketPop = 1L).collect()
    }
  }

  test("packSequences / filteredPack guards fire when shards is undersized") {
    failsNaming("`shards`") {
      Sampling.packSequences(spark, sf, maxShardRows = 5L).collect()
    }
    failsNaming("`shards`") {
      Sampling.filteredPack(spark, sf, maxShardRows = 5L).collect()
    }
  }

  test("tokenBudget / applyMixture running-sum guards fire when shards is undersized") {
    failsNaming("`shards`") {
      Sampling.tokenBudget(spark, sf, maxShardRows = 5L).collect()
    }
    failsNaming("`shards`") {
      Sampling.applyMixture(spark, sf, maxShardRows = 5L).collect()
    }
    graft.Caches.releaseAll(spark)
  }

  test("contract-sized defaults stay silent and unchanged (d15 spot check)") {
    // same rows as before the guard existed: total partition of the corpus
    val n = graft.Tables.embeddings(spark, sf).count()
    Dedup.semDedup(spark, sf).count() shouldBe n
    graft.Caches.releaseAll(spark)
  }
}
