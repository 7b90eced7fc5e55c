package graft.operators

import org.apache.spark.sql.SparkSession

/** One-off: d13 at 1x/4x/10x with `planes` scaled per the s02 sizing
  * contract (2^planes ∝ corpus ⇒ constant bucket population) — the
  * counter-measurement to the fixed-planes sweep row, proving the
  * contract restores ~flat growth. Reuses the sweep's enlarged dirs.
  *
  * Usage: Test/runMain graft.operators.ProfileD13Planes (after ProfileScaleSweep)
  */
object ProfileD13Planes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((mult, planes) <- Seq((1, 4), (4, 6), (10, 7))) {
      val dir = s"/tmp/graft_scale_${mult}x"
      def run(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        val times = (1 to 3).map { _ =>
          graft.Caches.releaseAll(spark)
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[$name] ${mult}x planes=$planes min=${times.head}%.2f median=${times(1)}%.2f s")
      }
      run("d13")(Dedup.embeddingNearDupLsh(spark, dir, planes = planes))
      run("d14")(Dedup.embeddingNearDupMultiProbe(spark, dir, planes = planes))
    }
    spark.stop()
  }
}
