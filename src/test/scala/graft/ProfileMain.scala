package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling entry (test scope — not shipped): times one or more
  * queries twice (cold/warm) at a given sf dir.
  * Usage: Test/runMain graft.ProfileMain <sfDir> <query1> [query2 ...]
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names; run <- 1 to 2) {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      println(f"[profile] $n run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
