package graft.osm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class OsmModelSpec extends AnyFunSuite with Matchers with SparkSpec {

  private lazy val planetDf =
    spark.read.format("osm-pbf").load(
      PbfTestData.writeSample(Files.createTempDirectory("model")))

  test("typed Dataset[PlanetElement] round-trips the union-wide rows") {
    val ds = OsmModel.planet(planetDf)
    val byId = ds.collect().map(e => e.id -> e).toMap
    byId(1L).`type` shouldBe "node"
    byId(1L).lat shouldBe new java.math.BigDecimal("51.5000000")
    byId(1L).tags shouldBe Map("amenity" -> "cafe")
    byId(10L).`type` shouldBe "way"
    byId(10L).lat shouldBe null // NULL coords surface as null BigDecimal
    byId(10L).nds.map(_.ref) shouldBe Seq(1L, 2L, 3L)
    byId(20L).members.map(m => (m.`type`, m.ref, m.role)) shouldBe
      Seq(("node", 1L, "stop"), ("way", 10L, "outer"))
    byId(4L).uid shouldBe None // absent Info → None in the typed view
    // typed transformations compile against fields
    ds.filter(_.`type` == "node").count() shouldBe 5
  }

  test("the README workload runs through spark.sql over registered views") {
    OsmModel.registerViews(spark, planetDf)
    // tags['k'] filter + count — README.md:219-223 shape, SQL-first
    spark.sql(
      "SELECT count(*) AS n FROM planet WHERE tags['amenity'] IS NOT NULL")
      .head().getLong(0) shouldBe 1L
    // latest-version self-join — README.md:164-185 shape
    val latest = spark.sql(
      """SELECT p.type, p.id, p.version FROM planet_history p
        |JOIN (SELECT type, id, max(version) AS v FROM planet_history GROUP BY 1, 2) m
        |  ON p.type = m.type AND p.id = m.id AND p.version = m.v""".stripMargin)
    latest.count() shouldBe 7
    // bbox over decimals
    spark.sql(
      "SELECT count(*) AS n FROM planet WHERE lat BETWEEN 51.4 AND 51.65")
      .head().getLong(0) shouldBe 2L
  }
}
