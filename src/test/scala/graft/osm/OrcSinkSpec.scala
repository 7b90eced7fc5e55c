package graft.osm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class OrcSinkSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("planet PBF → ORC → re-read round-trip with sidecar metadata") {
    val pbf = PbfTestData.writeSample(Files.createTempDirectory("pbf"))
    val out = Files.createTempDirectory("orc").resolve("planet.orc").toString
    val df = spark.read.format("osm-pbf").load(pbf)
    OrcSink.writePlanet(df, out, bounds = OrcSink.pbfBounds(spark, pbf))

    val back = spark.read.orc(out)
    back.schema shouldBe OsmSchemas.Planet
    back.count() shouldBe 7
    // spot-check nested data survives ORC
    val way = back.filter("type = 'way'").head()
    way.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("nds").map(_.getLong(0)) shouldBe Seq(1L, 2L, 3L)

    val sidecar = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "_graft_metadata.json")), "UTF-8")
    sidecar should include(""""osm.schema.version": "0.6"""")
    sidecar should include(""""bounds": "-0.4,51,0.6,52"""")

    // footer parity (OsmPbf2Orc.java:90,122-125): every part file carries
    // the keys in its ORC footer, readable through orc-core itself
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".orc"))
    parts should not be empty
    parts.foreach { p =>
      OrcMetadata.readValue(p.getPath, conf, "osm.schema.version") shouldBe Some("0.6")
      OrcMetadata.readValue(p.getPath, conf, "bounds") shouldBe Some("-0.4,51,0.6,52")
    }
  }

  test("query workload answers identically on converted ORC and direct PBF") {
    // the core user journey: convert once, query the ORC table — every
    // analytic must give the answer the source gives (ORC round-trip
    // relaxes nullability flags; semantics must not move)
    val pbf = PbfTestData.writeSample(Files.createTempDirectory("pbf-q"))
    val out = Files.createTempDirectory("orc-q").resolve("planet.orc").toString
    val src = spark.read.format("osm-pbf").load(pbf)
    OrcSink.writePlanet(src, out, bounds = OrcSink.pbfBounds(spark, pbf))
    val orc = spark.read.orc(out)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    rows(OsmQueries.latestVersions(orc)
        .orderBy("type", "id")) shouldBe
      rows(OsmQueries.latestVersions(src).orderBy("type", "id"))
    rows(OsmQueries.reassembleWays(orc).orderBy("way_id")) shouldBe
      rows(OsmQueries.reassembleWays(src).orderBy("way_id"))
    rows(OsmQueries.tagUsageByMonth(orc, "highway")) shouldBe
      rows(OsmQueries.tagUsageByMonth(src, "highway"))
  }

  test("changesets XML → ORC round-trip") {
    val dir = Files.createTempDirectory("cs")
    val f = dir.resolve("c.osm")
    Files.write(f,
      """<osm><changeset id="9" open="true" comments_count="0" num_changes="1"/></osm>"""
        .getBytes("UTF-8"))
    val out = dir.resolve("changesets.orc").toString
    OrcSink.writeChangesets(ChangesetXml.read(spark, f.toString), out)
    val back = spark.read.orc(out)
    back.schema shouldBe OsmSchemas.Changesets
    back.head().getAs[Long]("id") shouldBe 9L
  }
}
