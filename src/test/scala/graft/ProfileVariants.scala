package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only experiment harness for bench hotspots. */
object ProfileVariants {
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

    def time(name: String)(f: => Unit): Unit = {
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"[v] $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val li = Tables.lineitem(spark, sfDir)

    time("q05_full") {
      operators.Relational.unnestOrdinality(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q05_no_orderby") {
      li.groupBy($"l_orderkey")
        .agg(array_sort(collect_list(struct($"l_linenumber", $"l_quantity"))).as("items"))
        .select($"l_orderkey", posexplode($"items").as(Seq("pos", "item")))
        .select($"l_orderkey", ($"pos" + 1).cast("int").as("idx"),
          $"item.l_quantity".cast("bigint").as("qty"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q05_window_form") {
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber", $"l_quantity")
      li.select($"l_orderkey", row_number().over(w).cast("int").as("idx"),
          $"l_quantity".cast("bigint").as("qty"))
        .orderBy($"l_orderkey", $"idx")
        .write.format("noop").mode("overwrite").save()
    }
    time("q01_full") {
      operators.Relational.pricingSummary(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q01_no_distinct") {
      li.filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").cast("bigint").as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
