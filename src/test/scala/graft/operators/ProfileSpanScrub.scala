package graft.operators

import graft.Caches
import org.apache.spark.sql.SparkSession

/** d17-vs-d18 amortization sweep: plan-only scrub pays the span
  * explode twice; [[Dedup.spanScrubCached]] pays it once and a SECOND
  * scrub in the same scope runs off the cache (~1x d17 — the VERDICT
  * r7 "ship the cached overload" done-criterion).
  * Run: sbt "Test/runMain graft.operators.ProfileSpanScrub"
  */
object ProfileSpanScrub {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (round <- Seq("cold", "warm")) {
      println(s"--- $round ---")
      time("d17 repeatedSpans (1x explode)") {
        run(Dedup.repeatedSpans(spark, sf))
      }
      time("d18 spanScrub plan-only (2x explode)") {
        run(Dedup.spanScrub(spark, sf))
      }
      val scope = Caches.scope()
      try {
        time("d18 spanScrubCached, first action") {
          run(Dedup.spanScrubCached(spark, sf))
        }
        time("d18 spanScrubCached, second action (amortized)") {
          run(Dedup.spanScrubCached(spark, sf))
        }
      } finally scope.release()
    }
    spark.stop()
  }
}
