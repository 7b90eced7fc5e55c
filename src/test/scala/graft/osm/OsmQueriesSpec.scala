package graft.osm

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The reference's README workload (SURVEY §2B) over an in-memory
  * planet-history fixture with known answers.
  */
class OsmQueriesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def dec(s: String): java.math.BigDecimal = new java.math.BigDecimal(s)

  private def planetRow(id: Long, typ: String, tags: Map[String, String],
      lat: String, lon: String, nds: Seq[Long], version: Long,
      visible: Boolean, tsMs: Long = 1000000L): Row =
    Row(id, typ, tags,
      Option(lat).map(dec).orNull, Option(lon).map(dec).orNull,
      nds.map(Row(_)), Seq.empty[Row], 1L, new Timestamp(tsMs), 1L, "u",
      version, visible)

  private lazy val history: DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      // node 1: two versions, latest visible
      planetRow(1, "node", Map("amenity" -> "cafe"), "51.5000000", "-0.1000000", Nil, 1, true),
      planetRow(1, "node", Map("amenity" -> "bar"), "51.5000000", "-0.1000000", Nil, 2, true),
      // node 2: deleted in v2
      planetRow(2, "node", Map(), "51.6000000", "-0.2000000", Nil, 1, true),
      planetRow(2, "node", Map(), "51.6000000", "-0.2000000", Nil, 2, false),
      // node 3: single version
      planetRow(3, "node", Map(), "51.7000000", "-0.3000000", Nil, 1, true),
      // way 10 over nodes 3,1,2 (order matters!)
      planetRow(10, "way", Map("highway" -> "residential"), null, null, Seq(3, 1, 2), 1, true,
        tsMs = 4000000000L))),
    OsmSchemas.Planet)

  test("reassembleWays keeps nd order (WITH ORDINALITY semantics)") {
    val ways = OsmQueries.reassembleWays(history.filter("version = 1 or type = 'way'"))
      .collect()
    ways.length shouldBe 1
    val coords = ways(0).getAs[scala.collection.Seq[scala.collection.Seq[java.math.BigDecimal]]]("coordinates")
    coords.map(_.head.toPlainString) shouldBe
      Seq("51.7000000", "51.5000000", "51.6000000") // way order 3,1,2
  }

  test("latestVersions (join form) == latestVersionsWindow (window form)") {
    val a = OsmQueries.latestVersions(history).select("type", "id", "version").collect().toSet
    val b = OsmQueries.latestVersionsWindow(history).select("type", "id", "version").collect().toSet
    a shouldBe b
    a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) shouldBe
      Set(("node", 1L, 2L), ("node", 2L, 2L), ("node", 3L, 1L), ("way", 10L, 1L))
  }

  test("deletedCount counts only latest-version-invisible elements") {
    val d = OsmQueries.deletedCount(history).collect()
    d.map(r => (r.getString(0), r.getLong(1))) shouldBe Array(("node", 1L))
  }

  test("nodesInBbox uses decimal comparison") {
    OsmQueries.nodesInBbox(history, -0.25, 0.0, 51.0, 52.0)
      .select("id").distinct().collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L)
  }

  test("tagUsageByMonth groups on the truncated expression") {
    val m = OsmQueries.tagUsageByMonth(history, "amenity").collect()
    m.length shouldBe 1
    m(0).getAs[Long]("n") shouldBe 2L // both versions of node 1 in Jan 1970
  }

  test("tagTransitions reports value changes per (type,id) version order") {
    val t = OsmQueries.tagTransitions(history, "amenity")
      .orderBy("version").collect()
    t.map(r => (r.getLong(r.fieldIndex("version")), r.getString(r.fieldIndex("value")),
      Option(r.getString(r.fieldIndex("prev_value"))))) shouldBe
      Array((1L, "cafe", None), (2L, "bar", Some("cafe")))
  }

  test("allGeometries unions node points with reassembled ways") {
    val g = OsmQueries.allGeometries(history.filter("version = 1 or type = 'way'"))
    g.count() shouldBe 4 // 3 nodes + 1 way
    g.filter("type = 'way'").head()
      .getAs[scala.collection.Seq[scala.collection.Seq[java.math.BigDecimal]]]("coordinates").length shouldBe 3
  }

  private def relRow(id: Long, members: Seq[(String, Long, String)]): Row =
    Row(id, "relation", Map.empty[String, String], null, null,
      Seq.empty[Row], members.map { case (t, r, role) => Row(t, r, role) },
      1L, new Timestamp(1000000L), 1L, "u", 1L, true)

  private def relPlanet(rels: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rels), OsmSchemas.Planet)

  test("expandRelations: transitive closure with min-depth collapse on a DAG") {
    val planet = relPlanet(Seq(
      relRow(100, Seq(("relation", 101L, ""), ("relation", 102L, ""))),
      relRow(101, Seq(("way", 10L, ""), ("relation", 102L, ""))),
      relRow(102, Seq(("node", 1L, "")))))
    val out = OsmQueries.expandRelations(planet, maxDepth = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    out shouldBe Set(
      // root 100: rel 102 reachable at depth 1 directly AND depth 2 via
      // 101 — min-depth keeps 1; node 1 at min depth 2
      (100L, "relation", 101L, 1), (100L, "relation", 102L, 1),
      (100L, "way", 10L, 2), (100L, "node", 1L, 2),
      (101L, "way", 10L, 1), (101L, "relation", 102L, 1),
      (101L, "node", 1L, 2),
      (102L, "node", 1L, 1))
  }

  test("expandRelations terminates on cycles via the depth bound") {
    val planet = relPlanet(Seq(
      relRow(200, Seq(("relation", 201L, ""))),
      relRow(201, Seq(("relation", 200L, "")))))
    val out = OsmQueries.expandRelations(planet, maxDepth = 6).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    // each root reaches the other at depth 1 and ITSELF at depth 2;
    // deeper revisits collapse into those min depths
    out shouldBe Set(
      (200L, 201L, 1), (200L, 200L, 2),
      (201L, 200L, 1), (201L, 201L, 2))
  }

  test("expandRelations maxDepth=1 is exactly the direct-member table") {
    val planet = relPlanet(Seq(
      relRow(100, Seq(("relation", 101L, ""), ("node", 5L, ""))),
      relRow(101, Seq(("way", 10L, "")))))
    val out = OsmQueries.expandRelations(planet, maxDepth = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    out shouldBe Set((100L, "relation", 101L, 1), (100L, "node", 5L, 1),
      (101L, "way", 10L, 1))
  }

  test("wayGeomStats: exact nanodegree bbox + Manhattan length, NULL for 1-point ways") {
    val planet = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        planetRow(1, "node", Map(), "51.5000000", "-0.1000000", Nil, 1, true),
        planetRow(2, "node", Map(), "51.6000000", "-0.2000000", Nil, 1, true),
        planetRow(3, "node", Map(), "51.7000000", "-0.3000000", Nil, 1, true),
        planetRow(10, "way", Map(), null, null, Seq(3, 1, 2), 1, true),
        planetRow(11, "way", Map(), null, null, Seq(1), 1, true))),
      OsmSchemas.Planet)
    val rows = OsmQueries.wayGeomStats(planet).collect()
      .map(r => r.getLong(r.fieldIndex("way_id")) -> r).toMap
    val w10 = rows(10L)
    w10.getLong(w10.fieldIndex("n_pts")) shouldBe 3L
    w10.getLong(w10.fieldIndex("min_lat_nano")) shouldBe 515000000L
    w10.getLong(w10.fieldIndex("max_lat_nano")) shouldBe 517000000L
    w10.getLong(w10.fieldIndex("min_lon_nano")) shouldBe -3000000L
    w10.getLong(w10.fieldIndex("max_lon_nano")) shouldBe -1000000L
    // order 3,1,2: (2e6 + 2e6) + (1e6 + 1e6)
    w10.getLong(w10.fieldIndex("manhattan_nano")) shouldBe 6000000L
    val w11 = rows(11L)
    w11.getLong(w11.fieldIndex("n_pts")) shouldBe 1L
    w11.isNullAt(w11.fieldIndex("manhattan_nano")) shouldBe true
  }

  test("polygonAreas: shoelace on known rings — square area, winding " +
    "both ways, degenerate line, open ways excluded") {
    // unit square 0.0001 deg on a side: 2A = 2 * (1000^2) nano^2
    val planet = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        planetRow(1, "node", Map(), "10.0000000", "20.0000000", Nil, 1, true),
        planetRow(2, "node", Map(), "10.0000000", "20.0001000", Nil, 1, true),
        planetRow(3, "node", Map(), "10.0001000", "20.0001000", Nil, 1, true),
        planetRow(4, "node", Map(), "10.0001000", "20.0000000", Nil, 1, true),
        // CCW square (x=lon increases, then y=lat increases)
        planetRow(20, "way", Map(), null, null, Seq(1, 2, 3, 4, 1), 1, true),
        // same ring reversed -> CW, same area
        planetRow(21, "way", Map(), null, null, Seq(1, 4, 3, 2, 1), 1, true),
        // out-and-back line: closed but zero area
        planetRow(22, "way", Map(), null, null, Seq(1, 2, 1, 2, 1), 1, true),
        // open way: excluded entirely
        planetRow(23, "way", Map(), null, null, Seq(1, 2, 3), 1, true),
        // closed but too short (3 entries): excluded
        planetRow(24, "way", Map(), null, null, Seq(1, 2, 1), 1, true))),
      OsmSchemas.Planet)
    val out = OsmQueries.polygonAreas(planet).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    out.keySet shouldBe Set(20L, 21L, 22L)
    out(20L) shouldBe ((5L, 2000000L, "CCW"))
    out(21L) shouldBe ((5L, 2000000L, "CW"))
    out(22L) shouldBe ((5L, 0L, "degenerate"))
  }

  test("polygonCentroids: known square plus a brute-force double " +
    "cross-check over the committed fixture") {
    // the o21 square again: the centroid of a square is its center,
    // which floors to (anchor + 500, anchor + 500) nanodegrees
    val planet = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        planetRow(1, "node", Map(), "10.0000000", "20.0000000", Nil, 1, true),
        planetRow(2, "node", Map(), "10.0000000", "20.0001000", Nil, 1, true),
        planetRow(3, "node", Map(), "10.0001000", "20.0001000", Nil, 1, true),
        planetRow(4, "node", Map(), "10.0001000", "20.0000000", Nil, 1, true),
        planetRow(20, "way", Map(), null, null, Seq(1, 2, 3, 4, 1), 1, true),
        planetRow(21, "way", Map(), null, null, Seq(1, 4, 3, 2, 1), 1, true),
        // degenerate out-and-back: excluded (no centroid)
        planetRow(22, "way", Map(), null, null, Seq(1, 2, 1, 2, 1), 1, true))),
      OsmSchemas.Planet)
    val out = OsmQueries.polygonCentroids(planet).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    out.keySet shouldBe Set(20L, 21L) // both windings; degenerate dropped
    out(20L) shouldBe ((200000500L, 100000500L))
    out(21L) shouldBe ((200000500L, 100000500L))

    // fixture-wide: the floored integer centroid must sit within one
    // nanodegree of an independent double-arithmetic recompute
    val fx = OsmFixture.planet(spark)
    val nodeRows = fx.filter(col("type") === "node")
      .filter(col("lat").isNotNull && col("lon").isNotNull)
      .select(col("id"), col("lat").cast("double"), col("lon").cast("double"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2))))
    // restrict the double cross-check to cleanly-resolvable ways:
    // every ref present exactly once (the exact gate covers the rest)
    val multi = nodeRows.groupBy(_._1).filter(_._2.length > 1).keySet
    val nodes = nodeRows.toMap
    val ways = fx.filter(col("type") === "way")
      .select(col("id"), col("nds.ref")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .filter { case (_, refs) =>
        refs.forall(rf => nodes.contains(rf) && !multi.contains(rf))
      }
    val got = OsmQueries.polygonCentroids(OsmFixture.planet(spark)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    got should not be empty
    ways.map(_._1).count(got.contains) should be > 0
    for ((wid, refs) <- ways if got.contains(wid)) {
      val pts = refs.map(nodes)
      val xs = pts.map(_._2 * 1e7)
      val ys = pts.map(_._1 * 1e7)
      var a2 = 0.0; var cx6 = 0.0; var cy6 = 0.0
      for (i <- 1 until pts.length) {
        val cr = xs(i - 1) * ys(i) - xs(i) * ys(i - 1)
        a2 += cr
        cx6 += (xs(i - 1) + xs(i)) * cr
        cy6 += (ys(i - 1) + ys(i)) * cr
      }
      val (n, gx, gy) = got(wid)
      withClue(s"way $wid: ") {
        n shouldBe pts.length.toLong
        math.abs(gx - cx6 / (3 * a2)) should be <= 1.5
        math.abs(gy - cy6 / (3 * a2)) should be <= 1.5
      }
    }
  }

  test("changeset helpers: comment filter, editor LIKE, bbox intersect") {
    val cs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Map("comment" -> "hi", "created_by" -> "JOSM 1.5"), null, false, null, 0L,
          dec("41.3000000"), dec("41.4000000"), dec("-124.1000000"), dec("-124.0000000"),
          1L, 1L, "u"),
        Row(2L, Map("created_by" -> "iD 2.0"), null, true, null, 0L,
          null, null, null, null, 0L, null, null))),
      OsmSchemas.Changesets)
    OsmQueries.changesetsWithComment(cs).count() shouldBe 1
    OsmQueries.changesetsByEditor(cs, "JOSM").head().getAs[Long]("n") shouldBe 1L
    OsmQueries.changesetsIntersecting(cs, -124.05, -124.01, 41.35, 41.39).count() shouldBe 1
  }

  test("changesetImpact: census recomputes from the FK, audit laws hold") {
    import org.apache.spark.sql.functions.col
    val rows = OsmOracle.changesetImpact(spark, "").collect()
    rows should not be empty
    // every changeset row survives the left join
    val csIds = OsmFixture.changesets(spark).select(col("id")).collect()
      .map(_.getLong(0)).sorted
    rows.map(_.getLong(0)).sorted shouldBe csIds
    // independent census from the planet side
    val byCs = OsmFixture.planet(spark)
      .select(col("changeset"), col("type")).collect()
      .groupBy(_.getLong(0))
      .map { case (c, es) => c -> es.map(_.getString(1)) }
    rows.foreach { r =>
      val id = r.getLong(0)
      val es = byCs.getOrElse(id, Array.empty[String])
      withClue(s"changeset $id: ") {
        r.getLong(1) shouldBe es.count(_ == "node").toLong
        r.getLong(2) shouldBe es.count(_ == "way").toLong
        r.getLong(3) shouldBe es.count(_ == "relation").toLong
        // the census partitions: total = nodes + ways + relations
        r.getLong(4) shouldBe r.getLong(1) + r.getLong(2) + r.getLong(3)
        r.getLong(6) shouldBe r.getLong(5) - r.getLong(4)
        // a node bbox exists exactly when nodes were touched
        r.isNullAt(7) shouldBe (r.getLong(1) == 0L)
      }
    }
    // the audit is non-vacuous: bounded changesets with touched nodes
    // resolve to a verdict, and on this fixture the verdict FIRES (the
    // synthetic declared bboxes don't cover the node coords — exactly
    // the mismatch the audit exists to surface); unbounded/untouched
    // rows stay NULL, never false
    rows.exists(r => !r.isNullAt(11) && !r.getBoolean(11)) shouldBe true
    rows.count(r => !r.isNullAt(11)) should be > 0
  }

  test("multipolygonRings: hand-derived ring table on the assembly fixture") {
    // the o27 geometry is explicit in OsmFixtureGen's multipolygon
    // block — each expected row is derivable on paper:
    //  30101 ring1: single closed outer square 0.1°×0.1° → 2A = 2e12 CCW
    //  30101 ring2: TWO open halves, the second traversed REVERSED,
    //               same square size → 2e12 CCW, n_ways = 2
    //  30101 ring3: inner hole 0.02°×0.02° wound CW → 2A = 8e10
    //  30102 ring1: two-way chain that never closes → open, NULL area
    //  30102 ring2: THREE forward-stitched ways, 0.05°×0.1° → 1e12 CCW
    val rows = OsmQueries.multipolygonRings(OsmFixture.planet(spark))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3),
        r.getBoolean(4), if (r.isNullAt(6)) -1L else r.getLong(6),
        r.getString(7)))
    val mp = rows.filter(t => t._1 == 30101L || t._1 == 30102L).toSet
    mp shouldBe Set(
      (30101L, 1, "outer", 1, true, 2000000000000L, "CCW"),
      (30101L, 2, "outer", 2, true, 2000000000000L, "CCW"),
      (30101L, 3, "inner", 1, true, 80000000000L, "CW"),
      (30102L, 1, "outer", 2, false, -1L, "open"),
      (30102L, 2, "outer", 3, true, 1000000000000L, "CCW"))
    // the legacy single-member multipolygons assemble too: one ring
    // each, closure judged by their member way's own geometry
    rows.count(_._1 < 30100L) shouldBe 3
    graft.Caches.releaseAll(spark)
  }
}
