package graft.osm

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot generator for the committed OSM oracle fixture
  * (fixtures/osm/ — see [[OsmFixture]]): writes deterministic history
  * + changeset XML, converts BOTH through this engine's own sources
  * (planet-history via [[OsmXml]], changesets via [[ChangesetXml]]),
  * derives the current-snapshot `planet` table with
  * [[OsmQueries.latestVersionsWindow]], and dumps all three as
  * single-file parquet. The parquet is committed so the driver's
  * DuckDB gate can read the exact same bytes the Spark o-queries read;
  * rerun only when the fixture content changes:
  * `sbt "Test/runMain graft.osm.OsmFixtureGen"`.
  *
  * Everything below is arithmetic on ids — no randomness, no clock —
  * so a regeneration reproduces identical row content.
  */
object OsmFixtureGen {

  private def nodeLat(id: Int) = f"51.$id%02d00000"
  private def nodeLon(id: Int) = f"-0.$id%02d00000"
  private def month(id: Int) = 1 + (id % 6)
  private def ts(id: Int, plusMonth: Int = 0) =
    f"2020-${month(id) + plusMonth}%02d-15T10:00:00Z"

  /** 40 nodes / 10 ways / 3 relations; versioned edits, retags,
    * deletions, ordered (and re-ordered) way nds, one closed ring.
    */
  private[osm] def historyXml: String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<osm version=\"0.6\" generator=\"graft-fixture\">\n"
    sb ++= "  <bounds minlat=\"51\" minlon=\"-0.5\" maxlat=\"52\" maxlon=\"0.5\"/>\n"
    def tag(k: String, v: String) = s"    <tag k=\"$k\" v=\"$v\"/>\n"
    def nodeTags(id: Int, retagged: Boolean): String = {
      val b = new StringBuilder
      if (id % 5 == 0) b ++= tag("amenity", if (retagged) "pub" else "cafe")
      if (id % 5 == 1) b ++= tag("amenity", if (retagged) "pub" else "bar")
      if (id % 7 == 0) b ++= tag("tourism", "museum")
      b.toString
    }
    for (id <- 1 to 40) {
      def node(version: Int, plusMonth: Int, visible: Boolean,
          retagged: Boolean): Unit = {
        val vis = if (visible) "" else " visible=\"false\""
        sb ++= s"""  <node id="$id" lat="${nodeLat(id)}" lon="${nodeLon(id)}" version="$version" changeset="${100 + id}" timestamp="${ts(id, plusMonth)}" uid="${1 + id % 7}" user="u${1 + id % 7}"$vis>\n"""
        sb ++= nodeTags(id, retagged)
        sb ++= "  </node>\n"
      }
      node(1, 0, visible = true, retagged = false)
      // every 4th node gets a retagging v2 one month later
      if (id % 4 == 0) node(2, 1, visible = true, retagged = true)
      // nodes 6 and 12 end deleted
      if (id == 6) node(2, 1, visible = false, retagged = false)
      if (id == 12) node(3, 2, visible = false, retagged = true)
    }
    for (w <- 101 to 110) {
      val base = w - 100
      // 4 consecutive node refs; way 103 closes its ring (first == last)
      val refs0 = Seq(base, base + 10, base + 20, base + 30)
      val refs = if (w == 103) refs0 :+ refs0.head else refs0
      def way(version: Int, plusMonth: Int, visible: Boolean,
          rs: Seq[Int]): Unit = {
        val vis = if (visible) "" else " visible=\"false\""
        sb ++= s"""  <way id="$w" version="$version" changeset="${200 + w}" timestamp="${ts(w, plusMonth)}" uid="${1 + w % 7}" user="u${1 + w % 7}"$vis>\n"""
        rs.foreach(r => sb ++= s"    <nd ref=\"$r\"/>\n")
        sb ++= tag("highway",
          Seq("residential", "primary", "footway")(w % 3))
        if (w % 2 == 0) sb ++= tag("created_by", "JOSM 1.5")
        sb ++= "  </way>\n"
      }
      way(1, 0, visible = true, refs)
      // way 106 re-orders its nds in v2 (order-sensitivity probe);
      // way 107 is deleted in v2
      if (w == 106) way(2, 1, visible = true, refs.reverse)
      if (w == 107) way(2, 1, visible = false, refs)
    }
    for (r <- 201 to 203) {
      sb ++= s"""  <relation id="$r" version="1" changeset="${300 + r}" timestamp="${ts(r)}" uid="1" user="u1">\n"""
      sb ++= s"""    <member type="way" ref="${101 + (r % 3)}" role="outer"/>\n"""
      sb ++= s"""    <member type="node" ref="${r - 200}" role=""/>\n"""
      sb ++= tag("type", "multipolygon")
      sb ++= "  </relation>\n"
    }
    sb ++= "</osm>\n"
    sb.toString
  }

  /** 20 changesets: editor tags (JOSM/iD/Potlatch/absent), comment
    * tags, bbox decimals (absent on the last four), open/closed.
    */
  private[osm] def changesetsXml: String = {
    val editors =
      Seq(Some("JOSM 1.5"), Some("JOSM/1.6 (1234 en)"), Some("iD 2.19"),
        Some("Potlatch 2"), None)
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<osm license=\"ODbL\" version=\"0.6\">\n"
    for (id <- 1 to 20) {
      val open = id % 5 == 0
      val closed =
        if (open) ""
        else f""" closed_at="2020-${month(id)}%02d-16T00:00:00Z""""
      val bbox =
        if (id <= 16)
          s""" min_lat="41.${id}0" max_lat="41.${id}5" min_lon="-124.${id}5" max_lon="-124.${id}0""""
        else ""
      sb ++= s"""  <changeset id="$id" created_at="${ts(id)}"$closed open="$open" user="u${id % 7}" uid="${id % 7}"$bbox num_changes="${id * 3}" comments_count="${id % 4}">\n"""
      editors(id % 5).foreach(e => sb ++= s"    <tag k=\"created_by\" v=\"$e\"/>\n")
      if (id % 3 == 0) sb ++= s"    <tag k=\"comment\" v=\"edit nr $id\"/>\n"
      sb ++= "  </changeset>\n"
    }
    sb ++= "</osm>\n"
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "fixtures/osm"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Files.createDirectories(Paths.get(s"$outDir/src"))
    val histXmlPath = s"$outDir/src/planet_history.osm"
    val csXmlPath = s"$outDir/src/changesets.osm"
    Files.write(Paths.get(histXmlPath), historyXml.getBytes("UTF-8"))
    Files.write(Paths.get(csXmlPath), changesetsXml.getBytes("UTF-8"))

    // convert through the engine's OWN sources — the committed parquet
    // is this engine's transcoder output, not hand-built rows
    val history = OsmXml.read(spark, histXmlPath)
    history.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/planet_history")
    val planet = OsmQueries.latestVersionsWindow(history)
      .filter(col("visible"))
    planet.coalesce(1).write.mode("overwrite").parquet(s"$outDir/planet")
    ChangesetXml.read(spark, csXmlPath).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/changesets")

    println(s"[fixture] history=${spark.read.parquet(s"$outDir/planet_history").count()} " +
      s"planet=${spark.read.parquet(s"$outDir/planet").count()} " +
      s"changesets=${spark.read.parquet(s"$outDir/changesets").count()} -> $outDir")
    spark.stop()
  }
}
