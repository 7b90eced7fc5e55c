package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileD04 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Any): Unit = {
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[v] $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      }
    }

    val sh = Dedup.shingleSet(spark, sfDir, None)
    time("shingleSet.count")(sh.count())
    val dict = Dedup.shingleDict(sh)
    time("dict.count")(dict.count())
    val withIds = sh.join(dict, "sh")
    time("join.count")(withIds.count())
    val lists = withIds.groupBy($"doc_id").agg(collect_list($"sid").as("sids"))
    time("sidLists.count")(lists.count())
    time("simhash_expr")(lists.select($"doc_id", expr(
      """aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, j) ->
        |  acc + IF(
        |    aggregate(sids, CAST(0 AS BIGINT), (v, s) ->
        |      v + IF((((4097 + 7919*j) * s + 17 + 104729*j) % 2147483647) % 2 = 1,
        |             CAST(1 AS BIGINT), CAST(-1 AS BIGINT))) > 0,
        |    shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin)
      .as("simhash")).write.format("noop").mode("overwrite").save())
    time("full_simhash")(Dedup.simHash(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
