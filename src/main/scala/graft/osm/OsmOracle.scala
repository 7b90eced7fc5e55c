package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's published workload (README.md:78-242) in DRIVER-
  * GATED form: each builder wraps an [[OsmQueries]] operator over the
  * committed converted fixture ([[OsmFixture]]) and projects an
  * oracle-comparable output — scalar columns only (the gate's row sort
  * rejects arrays/maps), aggregates aliased identically to the DuckDB
  * SQL in SparkEntry.oracleSql.
  *
  * These take the standard `(spark, sfDir)` query signature but read
  * the fixture, not sfDir — the OSM tables are the fixture's converted
  * planet/planet_history/changesets, which is the point: the gate now
  * checks the OSM-shaped forms themselves, not just their generic
  * twins (q05/q06/q07/q09/q11).
  */
object OsmOracle {

  /** The committed `.osm.pbf` twin of the history fixture (encoded by
    * OsmFixtureGen from the XML-converted parquet), converted LIVE by
    * the DSv2 PBF source — the reference's PRIMARY entry format
    * (OsmPbf2Orc.java:54-286) under the same DuckDB gate as the XML
    * path: o12/o13's oracle SQL reads the XML-converted parquet, so a
    * green hash proves PBF-decode == XML-decode row-for-row.
    */
  private def pbfHistory(spark: SparkSession): DataFrame =
    graft.osm.pbf.OsmPbfSource.read(
      spark, s"${OsmFixture.dir}/src/planet_history.osm.pbf")

  /** README ways-reassembly, gated: ordered coordinates flattened to a
    * `lat,lon;lat,lon` path string (order-sensitivity survives; the
    * array itself may not appear in gated output). Deleted nodes drop
    * their positions via the inner join, as in the reference workload.
    */
  def reassembledWayPaths(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.reassembleWays(OsmFixture.planet(spark))
      .select(col("way_id"),
        size(col("coordinates")).cast("bigint").as("n_pts"),
        array_join(
          transform(col("coordinates"), c =>
            concat_ws(",", c.getItem(0).cast("string"),
              c.getItem(1).cast("string"))), ";").as("coord_path"))
      .orderBy(col("way_id"))

  /** README latest-version (join form), gated: scalar columns. */
  def latestVersionRows(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.latestVersions(OsmFixture.history(spark))
      .select(col("type"), col("id"), col("version"), col("visible"),
        col("changeset"), col("uid"), col("user").as("usr"))
      .orderBy(col("type"), col("id"))

  /** README currently-deleted count per type, gated as-is. */
  def deletedCounts(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.deletedCount(OsmFixture.history(spark))
      .select(col("type"), col("n_deleted"))

  /** README tag-usage by month, gated (month cast DATE — the q09
    * cross-engine date_trunc convention).
    */
  def tagUsagePerMonth(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.tagUsageByMonth(OsmFixture.history(spark), "amenity")
      .select(col("month").cast("date").as("month"), col("n"))

  /** README nodes-in-bbox, gated: decimal comparison semantics. The
    * coordinates cast to strings IN-PLAN (the o01/o09 decimal-output
    * convention) so the gate hashes canonical text, not engine-side
    * decimal renderings.
    */
  def bboxNodes(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.nodesInBbox(OsmFixture.planet(spark),
        minLon = -0.25, maxLon = -0.05, minLat = 51.05, maxLat = 51.25)
      .select(col("id"), col("lat").cast("string").as("lat"),
        col("lon").cast("string").as("lon"))
      .orderBy(col("id"))

  /** README changesets-by-editor (LIKE prefix on a map value). */
  def editorCounts(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.changesetsByEditor(OsmFixture.changesets(spark), "JOSM")

  /** README changesets-intersecting-bbox on the decimal bbox columns
    * (NULL-bbox changesets fall out of the comparisons, both engines).
    */
  def intersectingChangesets(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.changesetsIntersecting(OsmFixture.changesets(spark),
        minLon = -124.18, maxLon = -124.02, minLat = 41.05, maxLat = 41.3)
      .select(col("id"), col("num_changes"))
      .orderBy(col("id"))

  /** The tag-transitions window form (README's recommended history
    * idiom), gated as-is: lag over unique versions is deterministic.
    */
  def amenityTransitions(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.tagTransitions(OsmFixture.history(spark), "amenity")
      .orderBy(col("type"), col("id"), col("version"))

  /** README all-geometries (node points UNION ALL reassembled ways),
    * gated with the o01 path flattening.
    */
  def geometryPaths(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.allGeometries(OsmFixture.planet(spark))
      .select(col("id"), col("type"),
        size(col("coordinates")).cast("bigint").as("n_pts"),
        array_join(
          transform(col("coordinates"), c =>
            concat_ws(",", c.getItem(0).cast("string"),
              c.getItem(1).cast("string"))), ";").as("coord_path"))
      .orderBy(col("type"), col("id"))

  /** README changesets-with-comment (map-key existence + extraction). */
  def commentedChangesets(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.changesetsWithComment(OsmFixture.changesets(spark))
      .select(col("id"),
        col("tags").getItem("comment").as("comment"),
        col("user").as("usr"), col("num_changes"))
      .orderBy(col("id"))

  /** Discussion array (the opt-in column EXCEEDING the reference's TODO
    * at OsmPbf2Orc.java:193-195) under the gate: the fixture generator
    * writes exactly `comments_count` comments with uid/text arithmetic
    * on (id, j), so the oracle recomputes n_comments from the parquet's
    * `comments_count` and first_uid/first_text from `id` alone — a
    * green hash proves the array-of-struct parse (count, order, attr
    * and nested-text extraction) end-to-end.
    */
  def discussionComments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("osm-changesets").option("discussion", true)
      .load(s"${OsmFixture.dir}/src/changesets.osm")
      .filter(size(col("discussion")) > 0)
      .select(col("id"),
        size(col("discussion")).cast("bigint").as("n_comments"),
        element_at(col("discussion"), 1).getField("uid").as("first_uid"),
        element_at(col("discussion"), 1).getField("text").as("first_text"))
      .orderBy(col("id"))

  /** PBF-converted latest-versions (the o02 form over [[pbfHistory]]):
    * scalar metadata decode parity (type/id/version/visible/changeset/
    * uid/user) for the DenseInfo + Info paths.
    */
  def pbfLatestVersionRows(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.latestVersions(pbfHistory(spark))
      .select(col("type"), col("id"), col("version"), col("visible"),
        col("changeset"), col("uid"), col("user").as("usr"))
      .orderBy(col("type"), col("id"))

  /** PBF-converted nodes-in-bbox (the o05 form, with the current
    * snapshot derived in-plan exactly as the fixture generator derives
    * the committed planet table): coordinate decode parity for the
    * delta-zigzag nanodegree path, string-cast per the decimal-output
    * convention.
    */
  def pbfBboxNodes(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.nodesInBbox(
        OsmQueries.latestVersionsWindow(pbfHistory(spark))
          .filter(col("visible")),
        minLon = -0.25, maxLon = -0.05, minLat = 51.05, maxLat = 51.25)
      .select(col("id"), col("lat").cast("string").as("lat"),
        col("lon").cast("string").as("lon"))
      .orderBy(col("id"))

  /** Super-relation transitive expansion (o15): the iterative-fixpoint
    * recursion over the fixture's relation hierarchy (superroute →
    * routes → multipolygons → ways/nodes, a depth-3 DAG with shared
    * children), gated against DuckDB's WITH RECURSIVE — green hash
    * proves the driver-loop recursion and a declarative recursive CTE
    * compute the same closure, including the min-depth collapse of
    * multi-path members.
    */
  def superRelationMembers(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.expandRelations(OsmFixture.planet(spark), maxDepth = 5)
      .orderBy(col("root_id"), col("member_type"), col("ref"))

  /** Way bbox + Manhattan length in exact nanodegree integers (o16):
    * every output column is a bigint (or NULL for single-point ways,
    * identically in both engines), so the geometry aggregation is
    * hash-gated without any float canonicalization caveat.
    */
  def wayGeomStats(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.wayGeomStats(OsmFixture.planet(spark))
      .orderBy(col("way_id"))

  /** Closed-ring shoelace areas + winding (o21): exact integer
    * nanodegree² doubled areas, anchored at the first vertex.
    */
  def polygonAreas(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.polygonAreas(OsmFixture.planet(spark))

  def polygonCentroids(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.polygonCentroids(OsmFixture.planet(spark))

  /** PBF-converted tag-usage-by-month (the o04 form over
    * [[pbfHistory]]): tags-map (keys_vals string-table runs) and
    * timestamp (DenseInfo delta + date granularity) decode parity —
    * the two dimensions o12/o13 don't reach.
    */
  def pbfTagUsagePerMonth(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.tagUsageByMonth(pbfHistory(spark), "amenity")
      .select(col("month").cast("date").as("month"), col("n"))

  /** PBF-converted current snapshot, derived in-plan exactly as the
    * fixture generator derives the committed planet table (latest
    * visible versions) — the shared base for o17/o18.
    */
  private def pbfPlanet(spark: SparkSession): DataFrame =
    OsmQueries.latestVersionsWindow(pbfHistory(spark)).filter(col("visible"))

  /** PBF-converted ways reassembly (o17): the o01 form over
    * [[pbfPlanet]], gated against o01's oracle SQL reading the
    * XML-converted parquet — hash-green proves the PBF Way `refs`
    * delta decode (OsmPbf2Orc.java:227-235 territory) yields the same
    * ordered nd lists as the XML path, position-for-position (the
    * coord_path string is order-sensitive). This closes the last PBF
    * decode dimension the o12/o13/o14 scalar gates don't reach for
    * ways.
    */
  def pbfReassembledWayPaths(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.reassembleWays(pbfPlanet(spark))
      .select(col("way_id"),
        size(col("coordinates")).cast("bigint").as("n_pts"),
        array_join(
          transform(col("coordinates"), c =>
            concat_ws(",", c.getItem(0).cast("string"),
              c.getItem(1).cast("string"))), ";").as("coord_path"))
      .orderBy(col("way_id"))

  /** PBF-converted relation members, flat WITH-ORDINALITY projection
    * (o18): one row per (relation, position) with member type, ref,
    * and role — gated against the XML-converted parquet. Hash-green
    * proves the PBF Relation member decode (memids delta, roles_sid
    * string-table, member-type enum — OsmPbf2Orc.java:247-277
    * territory) byte-equal to the XML path, including member ORDER
    * and role strings, which o15's closure query cannot distinguish.
    */
  def pbfRelationMembers(spark: SparkSession, sfDir: String): DataFrame =
    pbfPlanet(spark).filter(col("type") === "relation")
      .select(col("id").as("rel_id"),
        posexplode(col("members")).as(Seq("pos", "m")))
      .select(col("rel_id"), (col("pos") + 1).cast("int").as("idx"),
        col("m.type").as("member_type"), col("m.ref").as("ref"),
        col("m.role").as("role"))
      .orderBy(col("rel_id"), col("idx"))

  /** Z-order (Morton) clustering index over the fixture's nodes (o19)
    * — puts the custom CODEGEN'D Catalyst expression
    * [[graft.functions.ZOrderExpr]] itself under the DuckDB gate: the
    * oracle replays the 21-bit coordinate scaling (the exact
    * double-divide/multiply/truncate sequence) and the full Morton bit
    * interleave as generated integer arithmetic, so a single wrong bit
    * in the native expression's spread tables hash-mismatches. `zcell`
    * (the 12 coarsest interleaved bits — the spread places bit b at
    * position 3b, so the curve tops out at bit 61) is the stripe-level
    * clustering key the ORC sink sorts by ([[graft.osm.OrcSink]]) —
    * rows sharing a cell are spatial neighbors, which is what keeps
    * stripe min/max tight at planet scale.
    */
  def zorderNodes(spark: SparkSession, sfDir: String): DataFrame = {
    val z = graft.functions.ZOrderFunctions.zorder(col("lat"), col("lon"))
    OsmFixture.planet(spark)
      .filter(col("type") === "node" && col("lat").isNotNull &&
        col("lon").isNotNull)
      .select(col("id"), col("version"), z.as("zval"))
      .withColumn("zcell", shiftright(col("zval"), 50).cast("int"))
      .orderBy(col("id"), col("version"))
  }

  /** Z-range-pruned bbox scan (o20) — o19's index USED: the o05 bbox
    * query answered through the z-curve the ORC sink clusters by.
    * Because the Morton code is monotone in each coordinate (z =
    * spread(lon) + 2·spread(lat) on disjoint bit positions, spread
    * strictly increasing), every point of the bbox satisfies
    * z(minLat, minLon) <= zval <= z(maxLat, maxLon) — so that LITERAL
    * range is a lossless prefilter (a superset of the bbox), and on
    * z-sorted storage it is exactly the stripe min/max pruning window
    * a 100 TB planet scan rides. The exact bbox refine
    * ([[OsmQueries.nodesInBbox]], o05's own predicate) then drops the
    * false positives the curve's excursions admit.
    *
    * The GATE is the losslessness proof: the oracle is the PLAIN bbox
    * filter with no z logic anywhere — one true row dropped by the
    * range prefilter and the hashes diverge. ZRangeSpec additionally
    * measures that the prefilter genuinely prunes (candidates strictly
    * between the bbox count and the corpus count).
    */
  def zrangeBboxNodes(spark: SparkSession, sfDir: String): DataFrame = {
    val zmin = graft.functions.ZCurve.fromLatLon(51.05, -0.25)
    val zmax = graft.functions.ZCurve.fromLatLon(51.25, -0.05)
    val pre = OsmFixture.planet(spark)
      .withColumn("zval",
        graft.functions.ZOrderFunctions.zorder(col("lat"), col("lon")))
      .filter(col("zval").between(zmin, zmax)) // index predicate: literals
    OsmQueries.nodesInBbox(pre,
        minLon = -0.25, maxLon = -0.05, minLat = 51.05, maxLat = 51.25)
      .select(col("id"), col("lat").cast("string").as("lat"),
        col("lon").cast("string").as("lon"), col("zval"))
      .orderBy(col("id"))
  }

  /** Hilbert clustering index over the fixture's nodes (o23) — o19's
    * sibling with the adjacency-preserving curve: the codegen'd
    * [[graft.functions.HilbertExpr]] under the DuckDB gate, whose
    * oracle replays the 16-bit coordinate scaling and ALL sixteen
    * quadrant-rotation rounds as generated CASE arithmetic — one wrong
    * rotate/reflect and the hash diverges. `hcell` (the 8 coarsest
    * curve bits) is the stripe-clustering key variant; unlike zcell,
    * consecutive hcells are always spatially adjacent, which is the
    * property that keeps bbox scans from touching teleport stripes.
    */
  def hilbertNodes(spark: SparkSession, sfDir: String): DataFrame = {
    val h = graft.functions.HilbertFunctions.hilbert(col("lat"), col("lon"))
    OsmFixture.planet(spark)
      .filter(col("type") === "node" && col("lat").isNotNull &&
        col("lon").isNotNull)
      .select(col("id"), col("version"), h.as("hval"))
      .withColumn("hcell", shiftright(col("hval"), 24).cast("int"))
      .orderBy(col("id"), col("version"))
  }

  /** Changeset impact audit (o25) — the cross-TABLE integrity query an
    * OSM QA pipeline runs over the converted outputs (the reference's
    * two sinks, changesets and planet, joined on the changeset FK —
    * README.md:78-242's workload spans both but never joins them):
    * per changeset, the touched-element census by type, the bbox of
    * its touched NODES (exact decimals, stringified the o20 way), the
    * declared-vs-actual `num_changes` delta, and whether the node
    * bbox sits inside the changeset's declared bbox (SQL three-valued
    * logic where either side is absent — an open changeset with no
    * bounds audits as NULL, not false). Left join keeps empty
    * changesets visible.
    *
    * Scale shape: one groupBy on the changeset FK over planet (the
    * natural partition key for this audit at planet scale) + a
    * broadcast-sized changesets dim join.
    */
  def changesetImpact(spark: SparkSession, sfDir: String): DataFrame = {
    val p = OsmFixture.planet(spark)
    val touched = p.groupBy(col("changeset"))
      .agg(
        sum(when(col("type") === "node", 1L).otherwise(0L)).as("n_nodes"),
        sum(when(col("type") === "way", 1L).otherwise(0L)).as("n_ways"),
        sum(when(col("type") === "relation", 1L).otherwise(0L)).as("n_rels"),
        count(lit(1)).as("n_total"),
        min(when(col("type") === "node", col("lat"))).as("nmin_lat"),
        max(when(col("type") === "node", col("lat"))).as("nmax_lat"),
        min(when(col("type") === "node", col("lon"))).as("nmin_lon"),
        max(when(col("type") === "node", col("lon"))).as("nmax_lon"))
    OsmFixture.changesets(spark)
      .select(col("id"), col("min_lat"), col("max_lat"), col("min_lon"),
        col("max_lon"), col("num_changes"))
      .join(touched, col("id") === col("changeset"), "left")
      .select(col("id"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_ways"), lit(0L)).as("n_ways"),
        coalesce(col("n_rels"), lit(0L)).as("n_rels"),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        col("num_changes"),
        (col("num_changes") - coalesce(col("n_total"), lit(0L))).as("delta"),
        col("nmin_lat").cast("string").as("node_min_lat"),
        col("nmax_lat").cast("string").as("node_max_lat"),
        col("nmin_lon").cast("string").as("node_min_lon"),
        col("nmax_lon").cast("string").as("node_max_lon"),
        (col("nmin_lat") >= col("min_lat") && col("nmax_lat") <= col("max_lat") &&
          col("nmin_lon") >= col("min_lon") && col("nmax_lon") <= col("max_lon"))
          .as("in_bounds"))
      .orderBy(col("id"))
  }

  /** Multipolygon ring assembly (o27) — [[OsmQueries.multipolygonRings]]
    * over the fixture snapshot: ring grouping, stitched closure (with
    * way reversal), and exact o21 shoelace area/winding per ring, all
    * under the DuckDB gate replaying the same label + walk rounds as
    * generated CTEs.
    */
  def multipolygonRings(spark: SparkSession, sfDir: String): DataFrame =
    OsmQueries.multipolygonRings(OsmFixture.planet(spark))

  /** Replication-maintained table, end-to-end (o26) — the reference's
    * live-pipeline equivalent (OrcWriter.java:242-272, the osmosis
    * `--read-xml-change → --write-orc` flow) driven THROUGH the real
    * Structured Streaming machinery under the DuckDB gate: initialize
    * gen-init from the fixture history, stream the two committed
    * fixture diffs ([[OsmFixture.dir]]/src/replication) through
    * [[graft.streaming.Replication.start]] with maxFilesPerTrigger = 1
    * (two separate micro-batches — two generation writes, a pointer
    * swing each, and a retirement pass), await AvailableNow
    * termination, and read the LIVE table back through the `_CURRENT`
    * pointer. The oracle replays the maintained-table semantics from
    * the base parquet plus the diffs' parsed rows as literal VALUES:
    * one window rn = 1 per (type, id) over base ∪ diffs ordered by
    * (version DESC, timestamp DESC, diff-over-base) — exactly
    * [[graft.osm.OsmChange.applyDiff]] folded over both batches (the
    * fixture diffs carry strictly increasing versions, so batch order
    * cannot matter — the idempotence/ordering contract Replication
    * documents). Hash-green proves file discovery, the `.osc` decode,
    * the fold, generation naming, pointer atomicity, and retirement
    * leave EXACTLY the table the batch operator defines.
    */
  def replicationMaintained(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val work = java.nio.file.Files.createTempDirectory("graft-o26-")
    // the returned plan stays lazy over the generation files — clean
    // the work tree at JVM exit, not eagerly
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(work.toFile)
    }))
    val tableDir = s"$work/table"
    val diffDir = s"$work/diffs"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(diffDir))
    Seq("001.osc", "002.osc").foreach { f =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${OsmFixture.dir}/src/replication/$f"),
        java.nio.file.Paths.get(s"$diffDir/$f"))
    }
    graft.streaming.Replication.initialize(OsmFixture.history(spark), tableDir)
    val q = graft.streaming.Replication.start(spark, diffDir, tableDir,
      checkpointDir = s"$work/ck", maxFilesPerTrigger = 1,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    graft.streaming.Replication.currentTable(spark, tableDir)
      .select(col("type"), col("id"), col("version"), col("visible"),
        col("changeset"), col("uid"), col("user").as("usr"),
        col("lat").cast("string").as("lat_s"),
        col("lon").cast("string").as("lon_s"),
        size(col("tags")).cast("int").as("n_tags"),
        size(col("nds")).cast("int").as("n_nds"))
      .orderBy(col("type"), col("id"))
  }

  /** Curve-locality comparison (o24) — the layout decision o19/o23
    * exist to inform, made measurable: for the o20 bbox's nodes, each
    * curve's cell footprint at the SAME granularity (a 2048×2048 world
    * grid — z's top 11 coordinate bits densely re-interleaved vs
    * Hilbert's top 22 curve bits). `n_cells` is how many stripes a
    * cell-clustered
    * layout must touch; `span` (max − min + 1) is what a min/max-
    * pruned contiguous scan reads — the number Hilbert's
    * adjacency-preservation shrinks and Morton's quadrant teleports
    * inflate. The gate hash-pins both pipelines' cell arithmetic in
    * one result; CurveLocalitySpec asserts the measured ordering.
    */
  def curveLocality(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = OsmFixture.planet(spark)
      .filter(col("type") === "node" &&
        col("lon").between(-0.25, -0.05) && col("lat").between(51.05, 51.25))
    // dense 22-bit Morton cell (2048×2048 world grid — ~0.1-0.2°
    // cells, fine enough that the o20 bbox spans several): the shipped
    // spread is 3-spaced (bit b of lon at 3b, of lat at 3b+1), so the
    // top-11 coordinate bits (b = 10..20) are REPACKED into a dense
    // 2-D interleave — without this the span would count the sparse
    // encoding's impossible cell values and the comparison to
    // Hilbert's dense bits would be meaningless
    val zv = graft.functions.ZOrderFunctions.zorder(col("lat"), col("lon"))
    val zcell = (0 until 11).map { b =>
      shiftleft(shiftright(zv, 30 + 3 * b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(zv, 31 + 3 * b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
    val z = nodes.select(lit("zorder").as("curve"), zcell.as("cell"))
    val h = nodes.select(lit("hilbert").as("curve"),
      shiftright(graft.functions.HilbertFunctions.hilbert(col("lat"), col("lon")),
        10).as("cell"))
    z.unionAll(h)
      .groupBy(col("curve"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("cell")).as("n_cells"),
        min(col("cell")).as("cell_min"), max(col("cell")).as("cell_max"),
        (max(col("cell")) - min(col("cell")) + 1).as("span"))
      .orderBy(col("curve"))
  }
}
