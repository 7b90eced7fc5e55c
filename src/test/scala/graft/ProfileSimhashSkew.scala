package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md: population of the banded-hamming
  * buckets (top-16 fingerprint bits) that d04_simhash_pairs self-joins
  * on, at sf0.1 — the structural-skew watch item from VERDICT r2.
  */
object ProfileSimhashSkew {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = graft.operators.Dedup.simHash32ForProfile(spark, sf).cache()
    val nDocs = base.count()
    for ((label, bucket) <- Seq(
        "hi(16-31)" -> ($"simhash" / 65536).cast("bigint"),
        "lo(0-15)" -> ($"simhash" % 65536))) {
      val fp = base.withColumn("bucket", bucket)
      val hist = fp.groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc).limit(5).collect()
      val nBuckets = fp.select($"bucket").distinct().count()
      println(s"band=$label docs=$nDocs buckets=$nBuckets")
      hist.foreach(r => println(
        f"  bucket=${r.getLong(0)}%6d n=${r.getLong(1)}%6d frac=${r.getLong(1).toDouble / nDocs}%.4f"))
    }
    base.unpersist()
    Caches.releaseAll(spark)
    spark.stop()
  }
}
