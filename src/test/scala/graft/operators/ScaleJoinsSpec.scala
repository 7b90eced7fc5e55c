package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

class ScaleJoinsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin is bag-equal to the plain join on a skewed key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // skew fixture: hammer one part key
    val li = Tables.lineitem(spark, sf)
      .withColumn("l_partkey", when($"l_orderkey" % 3 === 0, lit(1L)).otherwise($"l_partkey"))
    val part = Tables.part(spark, sf)
    val plain = li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy("p_partkey").count()
    val salted = ScaleJoins.saltedJoin(li, part, "l_partkey", "p_partkey", 8)
      .groupBy("p_partkey").count()
    val a = plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = salted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    b shouldBe a
    // and the hot key fans out: salted plan joins on (key, salt)
    salted.queryExecution.optimizedPlan.toString should include("__salt")
  }

  test("bucketed tables join without a shuffle exchange") {
    val spark2 = spark
    import spark2.implicits._
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory persists — clear both before writing
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    ScaleJoins.writeBucketed(
      Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice"),
      "orders_b", "o_orderkey", 8)
    ScaleJoins.writeBucketed(
      Tables.lineitem(spark, sf).select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
      "lineitem_b", "o_orderkey", 8)
    // force the non-broadcast path so bucket co-location is observable
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ScaleJoins.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      joined.count() shouldBe Tables.lineitem(spark, sf).count()
      val plan = joined.queryExecution.executedPlan.toString
      // co-located buckets: SortMergeJoin with no shuffle on either side
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
      plan should include("Bucketed: true")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
