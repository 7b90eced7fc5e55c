package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic behind the SCALE.md §16 d22 row: the mutual-kNN
  * CC cost is pregel-rounds × per-round cost, and rounds track the
  * component DIAMETER — a data property, not a corpus-size property.
  * This prints, per sweep multiplier, the mutual-edge count, component
  * count, and max component size over the same enlarged corpora the
  * sweep writes (run the sweep first to materialize /tmp/graft_scale_*).
  */
object ProfileD22Structure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (mult <- Seq(1, 4, 10)) {
      val dir = s"/tmp/graft_scale_${mult}x"
      val out = Dedup.mutualKnnCanonicalize(spark, dir, k = 8 * mult)
      val comps = out.groupBy($"canonical_id").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_comp"), max($"sz").as("max_sz"),
          sum(when($"sz" > 1, 1).otherwise(0)).as("n_nontrivial"))
        .collect()(0)
      graft.Caches.releaseAll(spark)
      println(s"[d22] ${mult}x comps=${comps.getLong(0)} " +
        s"max_size=${comps.getLong(1)} nontrivial=${comps.getLong(2)}")
    }
    spark.stop()
  }
}
