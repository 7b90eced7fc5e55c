package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Caches, SparkSpec}

/** d07 decontaminate broadcast size-guard (VERDICT r2 "What's wrong" #1):
  * a corpus-proportional benchmark shingle set must NOT be broadcast —
  * past the limit the overlap join falls back to a key-partitioned
  * shuffle join, with identical results.
  */
class DecontaminateSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("under the limit the benchmark side broadcasts") {
    val df = TextAnalysis.decontaminate(spark, sf)
    df.collect()
    assert(planOf(df).contains("BroadcastHashJoin"),
      "expected the tiny benchmark set to broadcast")
    Caches.releaseAll(spark)
  }

  test("over the limit the join falls back to a shuffle join, same result") {
    val bc = TextAnalysis.decontaminate(spark, sf, minHit = 1)
    val bcRows = bc.collect().map(_.toSeq).toSeq
    Caches.releaseAll(spark)

    val sj = TextAnalysis.decontaminate(spark, sf, minHit = 1, broadcastLimit = 0L)
    val sjRows = sj.collect().map(_.toSeq).toSeq
    val plan = planOf(sj)
    assert(!plan.contains("BroadcastHashJoin"),
      s"size guard did not suppress the broadcast:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled join in the fallback plan:\n$plan")
    assert(sjRows === bcRows, "fallback path changed the result")
    Caches.releaseAll(spark)
  }

  test("benchSizeHint decides the join strategy without the eager count") {
    // the hint CONTRADICTS the actual size on both sides, so the chosen
    // strategy proves the count probe was never consulted (plan
    // construction stays lazy — advisor round-3 finding)
    val asHuge = TextAnalysis.decontaminate(spark, sf, minHit = 1,
      benchSizeHint = Some(Long.MaxValue))
    assert(!planOf(asHuge).contains("BroadcastHashJoin"),
      "hint=huge must force the shuffle join even for a tiny bench set")
    val asTiny = TextAnalysis.decontaminate(spark, sf, minHit = 1,
      broadcastLimit = 0L, benchSizeHint = Some(0L))
    assert(planOf(asTiny).contains("BroadcastHashJoin"),
      "hint<=limit must broadcast without counting")
    // both paths still produce the same rows
    assert(asHuge.collect().map(_.toSeq).toSeq ===
      asTiny.collect().map(_.toSeq).toSeq)
    Caches.releaseAll(spark)
  }

  test("an external bench set screens the WHOLE corpus (no %97 carve-out)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // benchmark = doc 0's own shingles; doc 0 has doc_id % 97 == 0 and
    // must still be flagged — the carve-out is only for the default
    // stand-in where %97 docs ARE the benchmark (round-3 review finding)
    val d0 = graft.functions.Text.tokenized(
        graft.Tables.documents(spark, sf).filter($"doc_id" === 0), "doc_id", "text")
      .select(explode(graft.functions.Text.shingles($"tk")).as("sh")).distinct()
    val flagged = TextAnalysis.decontaminate(spark, sf, minHit = 1,
      benchShingles = Some(d0))
    assert(flagged.filter($"doc_id" === 0).count() === 1)
    // default path: doc 0 is part of the stand-in benchmark, never flagged
    val dflt = TextAnalysis.decontaminate(spark, sf, minHit = 1)
    assert(dflt.filter($"doc_id" === 0).count() === 0)
    Caches.releaseAll(spark)
  }
}
