package graft.osm

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: PBF→ORC throughput measurement (BASELINE.md "still to
  * measure"). Generates a deterministic multi-blob PBF once, then times
  * the full convert at a given thread count.
  *
  * Usage: Test/runMain graft.osm.ProfilePbf <threads> [blobs] [nodesPerBlob]
  */
object ProfilePbf {

  def generate(path: String, blobs: Int, nodesPerBlob: Int): Unit = {
    if (Files.exists(Paths.get(path))) return
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    out.write(PbfTestData.frameBlob("OSMHeader",
      PbfTestData.headerBlock(-1800000000L, 1800000000L, 900000000000L, -900000000000L),
      compress = false))
    var nextId = 1L
    var rng = 42L
    def rand(): Long = { rng = rng * 6364136223846793005L + 1442695040888963407L; rng }
    for (b <- 0 until blobs) {
      val w = new PbfTestData.W
      val strings = Seq("", "highway", "residential", "name", "amenity", "cafe", "user1", "user2")
      w.msg(1) { st => strings.foreach(s => st.str(1, s)) }
      val ids = (0 until nodesPerBlob).map(i => nextId + i)
      val lats = ids.map(_ => (rand() % 89000000000L))
      val lons = ids.map(_ => (rand() % 179000000000L))
      // keys_vals: tag every 10th node amenity=cafe
      val kv = ids.zipWithIndex.flatMap { case (_, i) =>
        if (i % 10 == 0) Seq(4L, 5L, 0L) else Seq(0L)
      }
      w.msg(2) { g =>
        g.msg(2) { d =>
          d.packedDeltaZig(1, ids.map(identity))
          d.msg(5) { di =>
            di.packed(1, ids.map(_ => 1L))
            di.packedDeltaZig(2, ids.map(i => 1600000000L + (i % 1000)))
            di.packedDeltaZig(3, ids.map(i => 1000L + (i % 50)))
            di.packedDeltaZig(4, ids.map(i => 1L + (i % 2)))
            di.packedDeltaZig(5, ids.map(i => 6L + (i % 2)))
            di.packed(6, ids.map(_ => 1L))
          }
          d.packedDeltaZig(8, lats.map(_ / 100)) // granularity 100
          d.packedDeltaZig(9, lons.map(_ / 100))
          d.packed(10, kv)
        }
        // a few ways referencing this blob's nodes
        for (k <- 0 until 20) {
          g.msg(3) { wy =>
            wy.vint(1, 1000000000L + nextId + k)
            wy.packed(2, Seq(1L)); wy.packed(3, Seq(2L))
            wy.packedDeltaZig(8, (0 until 10).map(j => nextId + (k * 10 + j) % nodesPerBlob))
          }
        }
      }
      out.write(PbfTestData.frameBlob("OSMData", w.toArray, compress = true))
      nextId += nodesPerBlob
    }
    out.close()
  }

  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val blobs = args.lift(1).map(_.toInt).getOrElse(400)
    val nodesPerBlob = args.lift(2).map(_.toInt).getOrElse(16000)
    val pbf = s"/tmp/graft_bench_${blobs}x$nodesPerBlob.osm.pbf"
    val t0 = System.nanoTime()
    generate(pbf, blobs, nodesPerBlob)
    println(f"[pbf] generate: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      f"${Files.size(Paths.get(pbf)) / 1e6}%.1f MB")

    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // full row materialization, no sink I/O
    for (run <- 1 to 2) {
      val tn = System.nanoTime()
      spark.read.format("osm-pbf").load(pbf)
        .write.format("noop").mode("overwrite").save()
      println(f"[pbf] full-read noop run$run: ${(System.nanoTime() - tn) / 1e9}%.1f s")
    }
    // ORC write without the pre-write sort
    val tu = System.nanoTime()
    spark.read.format("osm-pbf").load(pbf)
      .write.mode("overwrite").option("orc.block.padding", "false")
      .orc(s"/tmp/graft_bench_nosort_$threads.orc")
    println(f"[pbf] orc-write unsorted: ${(System.nanoTime() - tu) / 1e9}%.1f s")

    val out = s"/tmp/graft_bench_planet_$threads.orc"
    val t1 = System.nanoTime()
    OrcSink.writePlanet(spark.read.format("osm-pbf").load(pbf), out,
      bounds = OrcSink.pbfBounds(spark, pbf))
    val convertSec = (System.nanoTime() - t1) / 1e9
    val mb = Files.size(Paths.get(pbf)) / 1e6
    println(f"[pbf] convert local[$threads]: $convertSec%.1f s = ${mb / convertSec}%.1f MB/s " +
      f"(${blobs.toLong * nodesPerBlob / convertSec / 1e6}%.2f M entities/s)")

    // OSM workload queries over the converted ORC (6.4M rows)
    val planet = spark.read.orc(out)
    val t3 = System.nanoTime()
    val nWays = OsmQueries.reassembleWays(planet).count()
    println(f"[pbf] reassembleWays on ORC: ${(System.nanoTime() - t3) / 1e9}%.1f s ($nWays ways)")
    val t4 = System.nanoTime()
    val nLatest = OsmQueries.latestVersionsWindow(planet).count()
    println(f"[pbf] latestVersionsWindow on ORC: ${(System.nanoTime() - t4) / 1e9}%.1f s ($nLatest)")
    val t5 = System.nanoTime()
    val nTagged = OsmQueries.tagUsageByMonth(planet, "amenity").count()
    println(f"[pbf] tagUsageByMonth on ORC: ${(System.nanoTime() - t5) / 1e9}%.1f s ($nTagged months)")

    // type-filter pushdown: a ways-only scan skips dense-node decode
    val t6 = System.nanoTime()
    val nW = spark.read.format("osm-pbf").load(pbf)
      .filter(org.apache.spark.sql.functions.col("type") === "way").count()
    println(f"[pbf] ways-only scan (type pushdown): ${(System.nanoTime() - t6) / 1e9}%.1f s ($nW ways)")

    // pruned aggregate directly over PBF (no ORC materialization)
    val t2 = System.nanoTime()
    val counts = spark.read.format("osm-pbf").load(pbf)
      .groupBy("type").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(f"[pbf] pruned count-by-type: ${(System.nanoTime() - t2) / 1e9}%.1f s → $counts")
    spark.stop()
  }
}
