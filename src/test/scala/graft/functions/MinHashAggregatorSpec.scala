package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class MinHashAggregatorSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("typed aggregator matches the single-pass expression signatures") {
    import spark.implicits._
    // deterministic (doc, sid) pairs
    val pairs = (0L until 200L).map(i => (i % 7, (i * 2654435761L) % 100003L))
    val ds = pairs.toDF("doc_id", "sid")

    val viaExpr = ds.groupBy($"doc_id")
      .agg(collect_list($"sid").as("sids"))
      .withColumn("sig", expr(
        """transform(sequence(0, 15), i ->
          |  aggregate(sids, CAST(2147483647 AS BIGINT),
          |    (m, s) -> least(m, ((4097 + 7919*i) * s + 17 + 104729*i) % 2147483647)))"""
          .stripMargin))
      .select($"doc_id", $"sig")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1).toSeq).toMap

    val viaAgg = ds.as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAggregator.toColumn.name("sig"))
      .collect()
      .map { case (doc, sig) => doc -> sig.toSeq }.toMap

    viaAgg shouldBe viaExpr
  }

  test("merge is order-insensitive (partial aggregation safe)") {
    val sids = Seq(5L, 99L, 1234L, 42L)
    val left = sids.take(2).foldLeft(MinHashAggregator.zero)(MinHashAggregator.reduce)
    val right = sids.drop(2).foldLeft(MinHashAggregator.zero)(MinHashAggregator.reduce)
    val all = sids.foldLeft(MinHashAggregator.zero)(MinHashAggregator.reduce)
    MinHashAggregator.merge(left, right).toSeq shouldBe all.toSeq
  }
}
