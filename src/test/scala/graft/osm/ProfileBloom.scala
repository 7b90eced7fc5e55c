package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence for the ORC bloom-filter writer option (SCALE.md): the
  * reference considered `orc.bloom.filter.columns` on `tags` and
  * commented it out (OsmPbf2Orc.java:86); we enable it. This measures
  * what it actually buys under Spark's reader:
  *
  *  - size overhead of blooms on the map column;
  *  - point-lookup time on a MAP key (tags['amenity']) — expected: NO
  *    benefit, Spark cannot push map-key predicates into the ORC
  *    SearchArgument, so the bloom is never consulted;
  *  - point-lookup time on a PRIMITIVE high-cardinality column (user =
  *    'x') — expected: large row-group skip, because equality DOES push
  *    down and min/max stats are useless on an unsorted high-cardinality
  *    column while blooms are exactly right.
  */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 3000000L
    val df = spark.range(n).select(
      $"id",
      lit("node").as("type"),
      when($"id" % 1000 === 0,
        map(lit("name"), concat(lit("place"), $"id"), lit("amenity"), lit("cafe")))
        .otherwise(map(lit("name"), concat(lit("place"), $"id"))).as("tags"),
      concat(lit("user"), pmod(xxhash64($"id"), lit(500000))).as("user"))

    def write(path: String, bloomCols: String): Unit = {
      val w = df.write.mode("overwrite").option("orc.block.padding", "false")
      (if (bloomCols.nonEmpty) w.option("orc.bloom.filter.columns", bloomCols)
       else w).orc(path)
    }
    def dirSize(path: String): Long = {
      val d = new java.io.File(path)
      d.listFiles().filter(_.getName.endsWith(".orc")).map(_.length()).sum
    }
    def timeQ(q: => Long): Double = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); q; (System.nanoTime() - t0) / 1e9
      }.min
    }

    val noBloom = "/tmp/bloom-off"
    val withBloom = "/tmp/bloom-on"
    write(noBloom, "")
    write(withBloom, "tags,user")
    for ((lbl, cols) <- Seq("tags-only" -> "tags", "user-only" -> "user")) {
      write("/tmp/bloom-x", cols)
      println(f"size $lbl=${dirSize("/tmp/bloom-x") / 1e6}%.1f MB " +
        f"overhead=${(dirSize("/tmp/bloom-x") - dirSize(noBloom)).toDouble / dirSize(noBloom) * 100}%.1f%%")
    }
    println(f"size off=${dirSize(noBloom) / 1e6}%.1f MB on=${dirSize(withBloom) / 1e6}%.1f MB " +
      f"overhead=${(dirSize(withBloom) - dirSize(noBloom)).toDouble / dirSize(noBloom) * 100}%.1f%%")

    def rd(p: String): DataFrame = spark.read.orc(p)
    // map-key lookup: does the predicate even push down?
    val mapQ = rd(withBloom).filter(element_at($"tags", "amenity") === "cafe")
    println("map-key PushedFilters: " + mapQ.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).take(1).mkString.trim)
    val userQ = rd(withBloom).filter($"user" === "user42")
    println("user PushedFilters: " + userQ.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).take(1).mkString.trim)

    for ((label, p) <- Seq("off" -> noBloom, "on" -> withBloom)) {
      val tMap = timeQ(rd(p).filter(element_at($"tags", "amenity") === "cafe").count())
      val tUser = timeQ(rd(p).filter($"user" === "user42").count())
      println(f"bloom=$label map-lookup=${tMap}%.2fs user-lookup=${tUser}%.2fs")
    }
    spark.stop()
  }
}
