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

  test("AQE skew-join fires on a hot key in the way→node join shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // SURVEY §7.4 watch item: the reference's most skew-prone join is
    // way→node reassembly where one node is referenced by a huge number
    // of ways. Fixture: a fact side where ONE key holds most of the
    // bytes, dim side uniform. Thresholds are scaled down so the same
    // AQE decision that protects the 100 TB join is observable at test
    // size; the assertion is on the FINAL adaptive plan (skew=true on
    // the SortMergeJoin), not on configuration.
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      val pad = "x" * 64
      // 120k refs to node 0, a handful to nodes 1..999
      val wayNds = spark.range(0, 120000)
        .select(lit(0L).as("ref"), concat(lit(pad), $"id").as("way_payload"))
        .unionByName(spark.range(1, 1000)
          .select($"id".as("ref"), concat(lit(pad), $"id").as("way_payload")))
      val nodes = spark.range(0, 1000)
        .select($"id".as("node_id"), ($"id" * 2).as("lat_q"))
      // consumer must not require the join key's partitioning (a
      // groupBy(ref) right after would forbid the split — AQE never
      // introduces an extra shuffle to fix skew); a global aggregate
      // imposes no such requirement, like the reference's reassembly
      // writing straight to the sink
      val joined = wayNds.join(nodes, $"ref" === $"node_id")
        .agg(count(lit(1)).as("n"),
          sum(org.apache.spark.sql.functions.length($"way_payload")).as("b"),
          sum($"lat_q").as("s"))
      val row = joined.collect().head
      row.getLong(0) shouldBe 120999L

      val finalPlan = joined.queryExecution.executedPlan.toString
      finalPlan should include("skew=true")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
