package graft.operators

import org.apache.spark.sql.SparkSession

/** Candidate-cut measurement for the PPJoin positional filter on
  * d23 (Jaccard prefix join) and d26 (containment join): counts the
  * candidate pairs the prefix+length filters produce WITH and WITHOUT
  * the positional conjunct, plus end-to-end times. The positional
  * filter is lossless (PrefixJoinSpec / the DuckDB gates prove output
  * equality); this main prices what it saves the verify join.
  */
object ProfileD23 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Any): Unit = {
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[v] $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      }
    }

    val sh = Dedup.shingleSet(spark, sfDir, None).cache()
    println(s"[v] shingle rows: ${sh.count()}")
    val docs = Dedup.sortedSidDocs(sh, 1, 2).cache()
    println(s"[v] docs: ${docs.count()}")

    time("d23 candidates WITHOUT positional")(
      Dedup.jaccardPrefixCandidates(docs, 1, 2, Long.MaxValue,
        positional = false).count())
    time("d23 candidates WITH positional")(
      Dedup.jaccardPrefixCandidates(docs, 1, 2, Long.MaxValue).count())
    time("d26 candidates WITHOUT positional")(
      Dedup.containmentCandidates(docs, 1, 2, Long.MaxValue,
        positional = false).count())
    time("d26 candidates WITH positional")(
      Dedup.containmentCandidates(docs, 1, 2, Long.MaxValue).count())

    time("d23 end-to-end")(
      Dedup.jaccardPrefixJoin(spark, sfDir).write
        .format("noop").mode("overwrite").save())
    graft.Caches.releaseAll(spark)
    time("d26 end-to-end")(
      Dedup.containmentJoin(spark, sfDir).write
        .format("noop").mode("overwrite").save())
    graft.Caches.releaseAll(spark)
    spark.stop()
  }
}
