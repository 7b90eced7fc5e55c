package graft.osm

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: output ORC size vs partition count / pre-write sort —
  * the reference's parallelism-vs-file-size observation
  * (OsmPbf2Orc.java:119-120) measured from the Spark side.
  */
object ProfileOrcSize {
  def main(args: Array[String]): Unit = {
    val pbf = "/tmp/graft_bench_400x16000.osm.pbf"
    ProfilePbf.generate(pbf, 400, 16000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".orc")).map(_.length()).sum
    }
    val df = spark.read.format("osm-pbf").load(pbf)
    val cases = Seq(
      ("32 partitions, input order", () => df),
      ("32 partitions, sortWithinPartitions(type,id)",
        () => df.sortWithinPartitions("type", "id")),
      ("4 partitions (coalesce), input order", () => df.coalesce(4)),
      ("32 partitions, repartition by random key (worst locality)",
        () => df.repartition(32)))
    for (((name, mk), i) <- cases.zipWithIndex) {
      val out = s"/tmp/graft_orcsize_$i"
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").option("orc.block.padding", "false").orc(out)
      println(f"[orcsize] $name: ${dirBytes(out) / 1e6}%.1f MB in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
