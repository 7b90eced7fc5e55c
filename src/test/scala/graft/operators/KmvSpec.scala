package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** q37 KMV sketch invariants beyond its oracle gate. */
class KmvSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("salted two-stage min-k equals the direct single-window min-k") {
    import spark.implicits._
    // recompute the kth hash the naive way (one window per lang) and
    // compare to the operator's salted two-stage selection
    val h = Tables.documents(spark, sf)
      .select($"lang", md5($"text".cast("binary")).as("h")).distinct()
    val direct = h
      .withColumn("rn", row_number().over(Window.partitionBy($"lang").orderBy($"h")))
      .filter($"rn" <= 32)
      .groupBy($"lang").agg(count(lit(1)).as("n_keys"), max($"h").as("kth_hash"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    val got = Relational.kmvDistinct(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(r.fieldIndex("n_keys")), r.getString(r.fieldIndex("kth_hash")))).toMap
    graft.Caches.releaseAll(spark)
    got shouldBe direct
  }

  test("estimate is exact below k and within 2x of truth above it") {
    val rows = Relational.kmvDistinct(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    rows.foreach { r =>
      val (nExact, nKeys, est) = (r.getLong(1), r.getLong(2),
        r.getDouble(r.fieldIndex("est")))
      if (nKeys < 32) est shouldBe nExact.toDouble
      else {
        // k=32 KMV standard error ~ 1/sqrt(k-2) ~ 18%; 2x is a loose
        // sanity band that a broken estimator cannot pass
        est should be >= nExact / 2.0
        est should be <= nExact * 2.0
      }
    }
  }
}
