package graft.operators

import graft.{Caches, Tables}
import org.apache.spark.sql.SparkSession

/** Stage-level timing of the canonicalize pipeline (d06 family — the
  * bench's most expensive query group): which stage dominates at sf0.1?
  * Run: sbt "Test/runMain graft.operators.ProfileCanon"
  */
object ProfileCanon {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val sf = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- Seq("cold", "warm")) {
      println(s"--- $round ---")
      val docs = Tables.documents(spark, sf)
      // stage 1: exact-dup edges
      time("exact edges") {
        docs.groupBy(md5($"text".cast("binary")).as("h"))
          .agg(min($"doc_id").as("keep"), collect_list($"doc_id").as("ids"))
          .select(explode($"ids").as("a"), $"keep".as("b"))
          .filter($"a" =!= $"b").write.format("noop").mode("overwrite").save()
      }
      // stage 2: shingle set (cached for later stages, like clusterMap)
      val sh = time("shingleSet+cache") {
        val s = graft.functions.Text.tokenized(docs, "doc_id", "text")
          .select($"doc_id", explode(graft.functions.Text.shingles($"tk")).as("sh"))
          .distinct().cache()
        s.write.format("noop").mode("overwrite").save()
        s
      }
      // stage 3: signatures + band candidates
      val cand = time("signatures+bands") {
        val withIds = sh.withColumn("sid",
          abs(xxhash64($"sh")) % lit(Dedup.Prime))
        val c = Dedup.bandCandidates(Dedup.signatures(withIds)).cache()
        c.write.format("noop").mode("overwrite").save()
        c
      }
      // stage 4: verify (pairOverlap + threshold)
      time("verify jaccard") {
        Dedup.pairOverlap(cand, sh)
          .filter($"ic" / ($"na" + $"nb" - $"ic") >= 0.6)
          .select($"a", $"b").write.format("noop").mode("overwrite").save()
      }
      // stage 5: full canonicalize end-to-end (includes GraphX CC)
      time("full d06") {
        Dedup.canonicalize(spark, sf).write.format("noop").mode("overwrite").save()
      }
      Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
