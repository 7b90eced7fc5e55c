package graft.operators

import org.apache.spark.sql.functions.{col, count, lit, xxhash64}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.BloomFunctions

/** The bloom-prefiltered incremental overlap (d12) must return EXACTLY
  * the no-bloom result: blooms admit false positives (killed by the
  * exact join) but never false negatives. Also pins the probe to the
  * codegen'd native expression, not a UDF.
  */
class BloomPrefilterSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bloom-prefiltered overlap equals the exact no-bloom computation") {
    import spark.implicits._
    val got = Dedup.incrementalOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.Caches.releaseAll(spark)

    val sh = Dedup.shingleSet(spark, sf, None)
    val hist = sh.filter($"doc_id" % 10 =!= 0).select($"sh").distinct()
    val expect = sh.filter($"doc_id" % 10 === 0)
      .join(hist, "sh")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_overlap"))
      .filter($"n_overlap" >= 5)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    got should not be empty
    got shouldBe expect
  }

  test("lazy overload: a caller-supplied bloom reproduces the eager d12 result") {
    import spark.implicits._
    // the caller builds the bloom on its own schedule (e.g. once per
    // daily delta) and DataFrame construction then runs no jobs
    val sh = Dedup.shingleSet(spark, sf, None)
    val bloom = sh.filter($"doc_id" % 10 =!= 0)
      .select(xxhash64($"sh").as("hv")).stat.bloomFilter("hv", 1000000L, 0.01)
    val lazyRes = Dedup.incrementalOverlap(spark, sf, bloom, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.Caches.releaseAll(spark)
    val eager = Dedup.incrementalOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.Caches.releaseAll(spark)
    lazyRes shouldBe eager
  }

  test("bloom admits every inserted key (no false negatives on real shingles)") {
    import spark.implicits._
    val sh = Dedup.shingleSet(spark, sf, None)
    val hist = sh.filter($"doc_id" % 10 =!= 0)
    val bloom = hist.select(xxhash64($"sh").as("hv"))
      .stat.bloomFilter("hv", 100000L, 0.01)
    // every history shingle must probe true through the native expression
    val missed = hist
      .filter(!BloomFunctions.bloomMightContain(bloom, xxhash64($"sh")))
      .count()
    missed shouldBe 0L
  }

  test("the probe plans as the native expression inside the filter") {
    val plan = Dedup.incrementalOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    graft.Caches.releaseAll(spark)
    plan should include("bloom_might_contain")
    plan.toLowerCase should not include "pythonudf"
  }

  test("property: every inserted key probes true for deterministic key sets") {
    import spark.implicits._
    // fully deterministic sweep (no Gen.sample: it returns an Option on
    // a nondeterministic RNG, so the randomized leg could silently not
    // run — and its keys differed per run). The splitmix64-style
    // multiplicative walk below covers the same ground reproducibly.
    for (n <- Seq(1, 17, 200, 500)) {
      val keys = (1 to n).map(i => 0x9E3779B97F4A7C15L * i + 0x7F4A7C15L)
      val bloom = keys.toDF("hv").stat.bloomFilter("hv", n.toLong.max(10L), 0.01)
      val missed = keys.toDF("hv")
        .filter(!BloomFunctions.bloomMightContain(bloom, col("hv")))
        .count()
      withClue(s"n=$n: ") { missed shouldBe 0L }
    }
    // a second deterministic family with different bit structure
    // (xorshift mix), sized against a fixed 256-capacity filter
    val mixed = (1 to 200).map { i =>
      var x = i.toLong * 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL; x ^ (x >>> 31)
    }
    val bloom = mixed.toDF("hv").stat.bloomFilter("hv", 256L, 0.01)
    val missed = mixed.toDF("hv")
      .filter(!BloomFunctions.bloomMightContain(bloom, col("hv"))).count()
    missed shouldBe 0L
  }

  test("sharded bloom path equals the broadcast-bloom d12 result exactly") {
    import spark.implicits._
    // the 100 TB form: per-shard blooms built+persisted task-side,
    // probe routed by shard — must be result-invariant like d12
    val sharded = Dedup.incrementalOverlapSharded(spark, sf, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.Caches.releaseAll(spark)
    val broadcast = Dedup.incrementalOverlap(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.Caches.releaseAll(spark)
    sharded should not be empty
    sharded shouldBe broadcast
  }

  test("sharded build: every history key probes true through its own shard") {
    import spark.implicits._
    val sh = Dedup.shingleSet(spark, sf, None)
    val hist = sh.filter($"doc_id" % 10 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-spec").toString
    val shards = 8
    val stats = Dedup.buildShardedBlooms(hist, dir, shards, 100000L).collect()
    // shard files exist for every non-empty shard; counts sum to |hist|
    stats.map(_.getLong(1)).sum shouldBe hist.count()
    // no false negatives: every history key must probe true through
    // the bloom of the shard its hash routes to
    val hconf = spark.sessionState.newHadoopConf()
    val missedDirect = hist.select(xxhash64($"sh").as("hv")).collect().count { r =>
      val hv = r.getLong(0)
      val shard = java.lang.Math.floorMod(hv, shards.toLong).toInt
      val p = new org.apache.hadoop.fs.Path(dir, f"shard-$shard%05d.bloom")
      val fs = p.getFileSystem(hconf)
      val in = fs.open(p)
      val bf = try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
      !bf.mightContainLong(hv)
    }
    missedDirect shouldBe 0
    // the manifest lists exactly the non-empty shards the stats report
    val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "manifest")), "UTF-8")
      .linesIterator.filter(_.nonEmpty).map(_.toInt).toSet
    manifest shouldBe stats.map(_.getInt(0)).toSet
    // a rebuild CLEARS the directory first: plant a stale shard file
    // beyond the shard range and rebuild — it must be gone
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-99999.bloom"), Array[Byte](1))
    Dedup.buildShardedBlooms(hist, dir, shards, 100000L).collect()
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "shard-99999.bloom")) shouldBe false
  }

  test("sharded probe fails loudly without a manifest (no silent false negatives)") {
    import spark.implicits._
    val sh = Dedup.shingleSet(spark, sf, None)
    val emptyDir = java.nio.file.Files.createTempDirectory("graft-bloom-nomf").toString
    val ex = intercept[Exception] {
      Dedup.incrementalOverlapShardedOn(sh, emptyDir, 8, 5).collect()
    }
    ex.getMessage should include("manifest")
  }

  test("probe rejects non-bigint keys with a type error") {
    import spark.implicits._
    val sh = Dedup.shingleSet(spark, sf, None).limit(1)
    val bloom = sh.select(xxhash64($"sh").as("hv")).stat.bloomFilter("hv", 10L, 0.1)
    val ex = intercept[Exception] {
      sh.filter(BloomFunctions.bloomMightContain(bloom, col("sh"))).collect()
    }
    ex.getMessage.toLowerCase should include("bigint")
  }
}
