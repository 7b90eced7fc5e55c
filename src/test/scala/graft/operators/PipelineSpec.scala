package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** End-to-end composition: the operators are not just individually
  * gate-correct, they chain into the actual training-data pipeline —
  * dedup → decontaminate → quality filter → budget packing — with each
  * stage narrowing the corpus and the whole flow deterministic.
  */
class PipelineSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("full corpus pipeline composes and is deterministic") {
    import spark.implicits._
    val total = Tables.documents(spark, sf).count()

    // 1. canonicalize: drop non-canonical duplicates (cached: every
    // downstream stage and count would otherwise re-run the whole
    // LSH + verify + connected-components pipeline)
    val keep = Dedup.canonicalize(spark, sf)
      .filter(!$"is_duplicate").select($"doc_id")
      .cache()
    val nKeep = keep.count()
    nKeep should be <= total
    nKeep should be > 0L

    // 2. decontaminate: drop docs overlapping the benchmark set
    val contaminated = TextAnalysis.decontaminate(spark, sf).select($"doc_id")
    val clean = keep.except(contaminated)
    val nClean = clean.count()
    nClean should be <= nKeep

    // 3. quality filter: keep docs above a quality floor
    val quality = TextAnalysis.textStats(spark, sf)
      .filter($"quality" >= 0.5).select($"doc_id")
    val good = clean.intersect(quality).cache()
    val nGood = good.count()
    nGood should be <= nClean
    nGood should be > 0L

    // 4. pack the survivors into per-shard token budgets
    val packed = Sampling.tokenBudget(spark, sf, perShardTokens = 2000)
      .join(good, "doc_id")
    val nPacked = packed.count()
    nPacked should be <= nGood

    // determinism: the same pipeline yields the same final set
    val again = Sampling.tokenBudget(spark, sf, perShardTokens = 2000)
      .join(good, "doc_id")
    again.select($"doc_id").collect().map(_.getLong(0)).sorted shouldBe
      packed.select($"doc_id").collect().map(_.getLong(0)).sorted
  }

  test("cleanMixture: stage monotonicity, shares telescope, stages agree") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = Sampling.cleanMixture(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    rows.foreach { r =>
      withClue(s"source ${r.getString(0)}: ") {
        r.getLong(2) should be <= r.getLong(1) // dedup never adds docs
        r.getLong(3) should be <= r.getLong(2) // quality never adds docs
        if (r.getLong(3) == 0L) r.getLong(4) shouldBe 0L
      }
    }
    // floor-ppm shares sum to 1e6 within one floor loss per source
    val shares = rows.map(_.getLong(5)).sum
    shares should be <= 1000000L
    shares should be >= 1000000L - rows.length.toLong
    // the composed stages equal the individually-gated operators:
    // survivors = d01 keepers ∩ t16 keeps, counted per source
    val keepers = Dedup.exactKeepers(
      graft.Tables.documents(spark, sf)).collect().map(_.getLong(0)).toSet
    val keeps = TextAnalysis.qualityClassifier(spark, sf)
      .filter($"keep").collect().map(_.getLong(0)).toSet
    graft.Caches.releaseAll(spark)
    val bySource = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expFinal = bySource
      .filter { case (id, _) => keepers(id) && keeps(id) }
      .groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    rows.foreach { r =>
      r.getLong(3) shouldBe expFinal.getOrElse(r.getString(0), 0L)
    }
    // every raw source keeps its row even at quota zero
    rows.map(_.getString(0)).toSet shouldBe bySource.map(_._2).toSet
  }

  test("epochSchedule: plan recomputes from token supplies, cap fires") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val rows = Sampling.epochSchedule(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    val supplies = graft.Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(r =>
        r.getString(1).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong).sum }
    val pqM = supplies.map { case (s, t) =>
      s -> BigDecimal(math.sqrt(t.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }
    val tot = pqM.values.sum
    rows.foreach { r =>
      val s = r.getString(0)
      withClue(s"source $s: ") {
        r.getLong(1) shouldBe supplies(s)
        r.getLong(2) shouldBe pqM(s)
        r.getLong(3) shouldBe pqM(s) * 1000000L / tot
        val alloc = 100000L * pqM(s) / tot
        r.getLong(4) shouldBe alloc
        val ep = alloc * 1000000L / supplies(s)
        r.getLong(5) shouldBe ep
        r.getBoolean(6) shouldBe ep > 4000000L
      }
    }
    // floor allocation never overspends the budget
    rows.map(_.getLong(4)).sum should be <= 100000L
    // both verdicts genuinely occur at this sf (small sources repeat
    // past the cap under sqrt up-weighting; big ones don't)
    rows.map(_.getBoolean(6)).distinct.length shouldBe 2
  }
}
