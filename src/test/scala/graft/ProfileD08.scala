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
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1", "/root/testdata/sf0.1")) {
      for (q <- Seq("d06_canonicalize", "d08_canonical_best")) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
        Caches.releaseAll(spark)
        println(f"$q $sf ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
