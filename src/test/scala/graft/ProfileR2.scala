package graft.operators

import org.apache.spark.sql.SparkSession

/** Round-2 profiling: the round-1 bench's dominant queries, 3 runs each
  * (min/median go into BASELINE.md BENCH_NOTES so host noise can be
  * separated from regression in later rounds).
  */
object ProfileR2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      println(f"[r2] $name min=${sorted.head}%.2f median=${sorted(1)}%.2f max=${sorted(2)}%.2f s")
    }

    time("d04_simhash")(Dedup.simHash(spark, sfDir))
    time("d04_simhash_pairs")(Dedup.simHashPairs(spark, sfDir))
    time("d04_simhash_pairs_hashed")(Dedup.simHashPairsHashed(spark, sfDir))
    time("d06_canonicalize")(Dedup.canonicalize(spark, sfDir))
    time("t03_fingerprint")(TextAnalysis.fingerprint(spark, sfDir))
    spark.stop()
  }
}
