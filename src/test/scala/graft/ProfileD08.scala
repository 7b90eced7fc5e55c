package graft

import org.apache.spark.sql.SparkSession

object ProfileD08 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // sf0.001 = JIT/codegen warm-up; sf0.1 runs twice — the first pays
    // cold plan costs, the SECOND ("warm") line is the reported number
    for ((sf, label) <- Seq("/root/testdata/sf0.001" -> "warmup",
        "/root/testdata/sf0.1" -> "cold", "/root/testdata/sf0.1" -> "warm")) {
      for (q <- Seq("d06_canonicalize", "d08_canonical_best")) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
        Caches.releaseAll(spark)
        println(f"$q $sf [$label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
