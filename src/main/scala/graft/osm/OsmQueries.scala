package graft.osm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's published analytic workload
  * (/root/reference/README.md:78-242), as composable DataFrame builders
  * over planet/planet_history/changesets DataFrames (SURVEY.md §2B).
  *
  * These are the OSM-shaped twins of graft.operators.Relational (which
  * proves the same constructs against the driver's oracle tables);
  * OsmQueriesSpec exercises them on golden fixtures.
  */
object OsmQueries {

  /** README.md:79-131 — reassemble way geometries: explode nds WITH
    * ORDINALITY (1-based), join node coordinates, collect ordered
    * coordinate arrays. The nodes side is huge at planet scale; the join
    * shuffles on node id, and AQE's skew join handles mega-shared nodes
    * (SURVEY §7.4).
    */
  def reassembleWays(planet: DataFrame): DataFrame = {
    val nodes = planet.filter(col("type") === "node")
      .select(col("id").as("node_id"), col("lat"), col("lon"))
    val ways = planet.filter(col("type") === "way")
      .select(col("id").as("way_id"), col("tags"), posexplode(col("nds")).as(Seq("pos", "nd")))
      .select(col("way_id"), col("tags"), (col("pos") + 1).as("idx"), col("nd.ref").as("ref"))
    ways.join(nodes, col("ref") === col("node_id"))
      .groupBy(col("way_id"))
      .agg(
        first(col("tags")).as("tags"), // Presto arbitrary(tags) ≡ first
        transform(
          array_sort(collect_list(struct(col("idx"), array(col("lat"), col("lon")).as("coord")))),
          x => x.getField("coord")).as("coordinates"))
  }

  /** README.md:99-100,238-241 — bbox containment on decimal coords. */
  def nodesInBbox(planet: DataFrame, minLon: Double, maxLon: Double,
      minLat: Double, maxLat: Double): DataFrame =
    planet.filter(col("type") === "node" &&
      col("lon").between(minLon, maxLon) && col("lat").between(minLat, maxLat))

  /** README.md:149-156 — tag-usage count by month for a given key. */
  def tagUsageByMonth(planet: DataFrame, tagKey: String): DataFrame =
    planet.filter(col("tags").getItem(tagKey).isNotNull)
      .groupBy(date_trunc("month", col("timestamp")).as("month"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("month"))

  /** README.md:164-185 — latest version of every element from history:
    * grouped-max self-join on (type, id, version), CASE-ranked output
    * order.
    */
  def latestVersions(history: DataFrame): DataFrame = {
    val latest = history.groupBy(col("type").as("t"), col("id").as("i"))
      .agg(max(col("version")).as("v"))
    history.join(latest,
        col("type") === col("t") && col("id") === col("i") && col("version") === col("v"))
      .drop("t", "i", "v")
      .orderBy(typeRank(col("type")), col("id"))
  }

  /** Same result via a window — one shuffle, preferred at scale. */
  def latestVersionsWindow(history: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("type"), col("id")).orderBy(col("version").desc)
    history.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(typeRank(col("type")), col("id"))
  }

  /** README.md:190-212 — count currently-deleted elements per type. */
  def deletedCount(history: DataFrame): DataFrame =
    latestVersionsWindow(history)
      .filter(!col("visible"))
      .groupBy(col("type")).agg(count(lit(1)).as("n_deleted"))
      .orderBy(typeRank(col("type")))

  /** README.md:178-183 — node < way < relation ordering rank. */
  def typeRank(t: Column): Column =
    when(t === "node", 1).when(t === "way", 2).when(t === "relation", 3).otherwise(4)

  /** README.md:219-223 — changesets with a comment tag. */
  def changesetsWithComment(changesets: DataFrame): DataFrame =
    changesets.filter(col("tags").getItem("comment").isNotNull)

  /** README.md:226-231 — count changesets by editor prefix (LIKE). */
  def changesetsByEditor(changesets: DataFrame, prefix: String): DataFrame =
    changesets.filter(col("tags").getItem("created_by").like(prefix + "%"))
      .groupBy(col("tags").getItem("created_by").as("editor"))
      .agg(count(col("id")).as("n"))
      .orderBy(col("editor"))

  /** README.md:233-241 — changesets whose bbox intersects a query bbox. */
  def changesetsIntersecting(changesets: DataFrame, minLon: Double, maxLon: Double,
      minLat: Double, maxLat: Double): DataFrame =
    changesets.filter(
      col("min_lon") <= maxLon && col("max_lon") >= minLon &&
        col("min_lat") <= maxLat && col("max_lat") >= minLat)

  /** README.md:134-145 — node + way coordinates UNION ALL (nodes as
    * single points, ways reassembled).
    */
  def allGeometries(planet: DataFrame): DataFrame = {
    val nodePts = planet.filter(col("type") === "node")
      .select(col("id"), col("type"), col("tags"),
        array(array(col("lat"), col("lon"))).as("coordinates"))
    val wayLines = reassembleWays(planet)
      .select(col("way_id").as("id"), lit("way").as("type"), col("tags"), col("coordinates"))
    nodePts.unionByName(wayLines)
  }

  /** Transitive member expansion of relations — the super-relation
    * hierarchy query the flat workload can't reach: the schema allows
    * relation-type members (README.md:21 `members` struct,
    * OsmPbf2Orc.java:253-268 member-type enum includes Relation), so
    * route masters / superroutes nest relations inside relations.
    *
    * Shape: breadth-first iterative fixpoint — a bounded driver loop
    * where each level joins the current relation frontier back to the
    * member-edge table (the standard Spark recursion idiom: one
    * equi-join shuffle per level, frontier persisted per round so the
    * emptiness probe and the next join share one computation; lineage
    * stays O(depth), and real hierarchies are shallow — OSM
    * superroutes bottom out in < 10 levels). Cycles are LEGAL in OSM
    * data: termination never relies on acyclicity — `maxDepth` bounds
    * the loop and the closing min-depth aggregate collapses repeated
    * visits. Multiple paths to the same member (shared children in the
    * DAG) also collapse to their shallowest depth.
    *
    * Output: one row per (root relation, member type, member ref)
    * reachable within `maxDepth`, with its minimum depth.
    */
  def expandRelations(planet: DataFrame, maxDepth: Int = 8): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val edges = planet.filter(col("type") === "relation")
      .select(col("id").as("rel_id"), explode(col("members")).as("m"))
      .select(col("rel_id"), col("m.type").as("member_type"),
        col("m.ref").as("ref"))
    // All rows in one level share the same depth, so deduplicating on
    // (root_id, ref) per level is result-invariant — without it,
    // multi-path DAG members multiply the frontier every level
    // (branching^depth wasted join work; the min-depth collapse hides
    // the blowup in the OUTPUT but not in the shuffles).
    def relFrontier(level: DataFrame): DataFrame =
      level.filter(col("member_type") === "relation")
        .select(col("root_id"), col("ref"), col("depth"))
        .dropDuplicates("root_id", "ref")
    var acc = edges.select(col("rel_id").as("root_id"), col("member_type"),
      col("ref"), lit(1).as("depth"))
    var frontier = relFrontier(acc).persist()
    var d = 1
    while (d < maxDepth && !frontier.isEmpty) {
      val next = frontier.alias("f").join(edges.alias("e"),
          col("f.ref") === col("e.rel_id"))
        .select(col("f.root_id"), col("e.member_type"), col("e.ref"),
          (col("f.depth") + 1).as("depth"))
      acc = acc.unionByName(next)
      val prev = frontier
      frontier = relFrontier(next).persist()
      prev.unpersist()
      d += 1
    }
    frontier.unpersist()
    acc.groupBy(col("root_id"), col("member_type"), col("ref"))
      .agg(min(col("depth")).as("depth"))
  }

  /** Per-way geometry aggregates in EXACT nanodegree integer
    * arithmetic (the house hash-gate discipline — no floats anywhere):
    * point count, lat/lon bbox, and the Manhattan path length
    * Σ |Δlat| + |Δlon| over consecutive nds. The decimal(9,7)/(10,7)
    * coordinates scale to nanodegree longs losslessly (×10⁷ is exact
    * on scale-7 decimals), so every output is a bigint both engines
    * agree on bit-for-bit.
    *
    * Shape: the o01 reassembly envelope (posexplode + node equi-join,
    * AQE skew-join for mega-shared nodes) plus one per-way window for
    * the segment lag — partitioned by way_id, so the window never
    * funnels (way sizes are small and bounded by the OSM data model).
    * Deleted nodes drop their positions via the inner join, exactly as
    * the README reassembly does.
    */
  def wayGeomStats(planet: DataFrame): DataFrame = {
    val nodes = planet.filter(col("type") === "node")
      .select(col("id").as("node_id"),
        (col("lat") * lit(10000000)).cast("long").as("lat_nano"),
        (col("lon") * lit(10000000)).cast("long").as("lon_nano"))
    val ways = planet.filter(col("type") === "way")
      .select(col("id").as("way_id"), posexplode(col("nds")).as(Seq("pos", "nd")))
      .select(col("way_id"), (col("pos") + 1).as("idx"), col("nd.ref").as("ref"))
    val w = Window.partitionBy(col("way_id")).orderBy(col("idx"))
    ways.join(nodes, col("ref") === col("node_id"))
      .withColumn("prev_lat", lag(col("lat_nano"), 1).over(w))
      .withColumn("prev_lon", lag(col("lon_nano"), 1).over(w))
      .groupBy(col("way_id"))
      .agg(count(lit(1)).as("n_pts"),
        min(col("lat_nano")).as("min_lat_nano"),
        max(col("lat_nano")).as("max_lat_nano"),
        min(col("lon_nano")).as("min_lon_nano"),
        max(col("lon_nano")).as("max_lon_nano"),
        sum(abs(col("lat_nano") - col("prev_lat")) +
          abs(col("lon_nano") - col("prev_lon"))).as("manhattan_nano"))
  }

  /** OSM multipolygon ring assembly (o27) — the first real geometry
    * consumer ask beyond the README workload: every `type=multipolygon`
    * relation's way members (roles outer/inner) grouped into RINGS,
    * with closure judged, member ways stitched end-to-end (reversing a
    * way when the ring walk enters at its last node), and each closed
    * ring's exact o21 shoelace area + winding. This is what every
    * polygon consumer of the converted planet rebuilds (osm2pgsql,
    * Athena geometry UDFs); holes are the inner rings, a lake-with-
    * islands relation has several outer rings.
    *
    * Deterministic two-phase assembly (mirrored verbatim by the DuckDB
    * oracle as generated CTE rounds — the s18/m38 iterative-chain
    * discipline):
    *
    *  1. COMPONENTS: per (relation, role), ways sharing an endpoint
    *     node join into one component by `labelRounds` rounds of
    *     min-way-id label propagation (label converges in ≤ chain
    *     length; rounds is a documented bound, not a heuristic).
    *  2. WALK: each component's ring starts at its minimum way id,
    *     oriented as stored; each round appends the candidate way
    *     touching the current open end, chosen by (way_id ASC, forward
    *     before reversed) — reversed traversal appends the reversed nd
    *     list. The walk closes when the open end returns to the start
    *     ref (with ≥ 4 stitched refs, o21's degenerate guard); a
    *     component that cannot extend reports closed = false with the
    *     refs stitched so far (broken/unclosed multipolygon — the QA
    *     signal this table exists to surface).
    *
    * Area: the stitched ref sequence of a closed ring is explicitly
    * closed (last ref = start ref), so o21's anchored integer shoelace
    * applies verbatim; refs missing from the node snapshot drop via
    * the inner join (both engines drop the same rows — the o21
    * convention). Unclosed rings report NULL area and 'open'.
    *
    * Contract bounds: `labelRounds` ≥ the longest way-chain and
    * `walkRounds` ≥ ways-per-ring, or a long chain reports split /
    * truncated (identically on both engines — the parameters are part
    * of the gate). Valid OSM multipolygons have degree-2 ring nodes;
    * a branched component walks deterministically by the tie-break and
    * reports whatever closes (or doesn't).
    *
    * Scale shape: member/way/node equi-joins are corpus-keyed; the
    * label and walk rounds iterate over the MEMBER-WAY frame only
    * (relations × member ways — thousands per relation at worst, never
    * corpus-sized); per-ring windows have component-sized populations.
    * At planet scale the assembly cost is member-linear, the node join
    * is the o01 shape (AQE skew-join), and nothing is quadratic.
    */
  def multipolygonRings(planet: DataFrame, labelRounds: Int = 6,
      walkRounds: Int = 8): DataFrame = {
    require(labelRounds >= 1 && walkRounds >= 1,
      s"need labelRounds/walkRounds >= 1: $labelRounds/$walkRounds")
    // each label/walk round reads the previous round's frame TWICE
    // (carry-forward + extension), so a persist-only loop accretes a
    // 2^rounds analyzed plan — the measured s25 lineage lesson;
    // localCheckpoint keeps the per-round plan O(1)
    def snap(df: DataFrame): DataFrame = df.localCheckpoint()
    val mw = planet.filter(col("type") === "relation" &&
        col("tags").getItem("type") === "multipolygon")
      .select(col("id").as("rel_id"), explode(col("members")).as("m"))
      .filter(col("m.type") === "way" && col("m.role").isin("outer", "inner"))
      .select(col("rel_id"), col("m.role").as("role"), col("m.ref").as("way_id"))
      .distinct()
    val wseq = planet.filter(col("type") === "way")
      .select(col("id").as("way_id"),
        expr("transform(nds, x -> x.ref)").as("refs"))
    // cached: endpoints, every label round, and every walk round read it
    val ways = graft.Caches.track(
      mw.join(wseq, "way_id")
        .select(col("rel_id"), col("role"), col("way_id"), col("refs"),
          element_at(col("refs"), 1).as("a"),
          element_at(col("refs"), -1).as("b")))
    // —— phase 1: min-label connectivity over shared endpoints ——
    val eps = ways.select(col("rel_id"), col("role"), col("way_id"),
      explode(array(col("a"), col("b"))).as("ep")).distinct()
    val nbrs = eps.as("x").join(eps.as("y"), Seq("rel_id", "role", "ep"))
      .select(col("rel_id"), col("role"), col("x.way_id").as("way_id"),
        col("y.way_id").as("nb"))
      .distinct()
    var lbl = ways.select(col("rel_id"), col("role"), col("way_id"),
      col("way_id").as("lbl"))
    // early exit once a round changes no label (r14-opt): the remaining
    // rounds are identity transforms — labels only decrease and a
    // no-change round proves the fixpoint — so the result is
    // bit-identical to running all `labelRounds` (which stays the
    // documented oracle bound); the convergence probe reads the
    // just-checkpointed frame (no recompute)
    var lblDone = false
    for (_ <- 1 to labelRounds if !lblDone) {
      val m = nbrs.join(
          lbl.select(col("rel_id"), col("role"),
            col("way_id").as("nb"), col("lbl").as("nlbl")),
          Seq("rel_id", "role", "nb"))
        .groupBy(col("rel_id"), col("role"), col("way_id"))
        .agg(min(col("nlbl")).as("mlbl"))
        .localCheckpoint()
      // convergence probe: any strict improvement this round? Both
      // sides are checkpointed tiny frames, so this is one cheap join
      lblDone = m.join(lbl, Seq("rel_id", "role", "way_id"))
        .filter(col("mlbl") < col("lbl")).isEmpty
      lbl = snap(
        lbl.join(m, Seq("rel_id", "role", "way_id"), "left")
          .select(col("rel_id"), col("role"), col("way_id"),
            least(col("lbl"), coalesce(col("mlbl"), col("lbl"))).as("lbl")))
    }
    val comp = graft.Caches.track(
      ways.join(lbl, Seq("rel_id", "role", "way_id")))
    // —— phase 2: the ring walk from each component's min way ——
    val stCols = Seq("rel_id", "role", "lbl", "refs", "used", "start_ref",
      "cur_end", "closed")
    var st = comp.filter(col("way_id") === col("lbl"))
      .select(col("rel_id"), col("role"), col("lbl"), col("refs"),
        array(col("way_id")).as("used"),
        element_at(col("refs"), 1).as("start_ref"),
        element_at(col("refs"), -1).as("cur_end"))
      .withColumn("closed",
        col("cur_end") === col("start_ref") && size(col("refs")) >= 4)
      .select(stCols.map(col): _*)
    var walkDone = false
    for (_ <- 1 to walkRounds if !walkDone) {
      val cands = st.filter(!col("closed")).as("s")
        .join(comp.as("c"),
          col("s.rel_id") === col("c.rel_id") &&
            col("s.role") === col("c.role") &&
            col("s.lbl") === col("c.lbl") &&
            !array_contains(col("s.used"), col("c.way_id")) &&
            (col("c.a") === col("s.cur_end") || col("c.b") === col("s.cur_end")))
        .withColumn("dir",
          when(col("c.a") === col("s.cur_end"), lit(0)).otherwise(lit(1)))
      val wPick = Window
        .partitionBy(col("s.rel_id"), col("s.role"), col("s.lbl"))
        .orderBy(col("c.way_id"), col("dir"))
      val ext = cands.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("s.rel_id").as("rel_id"), col("s.role").as("role"),
          col("s.lbl").as("lbl"),
          concat(col("s.refs"),
            when(col("dir") === 0, expr("slice(c.refs, 2, size(c.refs) - 1)"))
              .otherwise(expr("slice(reverse(c.refs), 2, size(c.refs) - 1)")))
            .as("refs"),
          concat(col("s.used"), array(col("c.way_id"))).as("used"),
          col("s.start_ref").as("start_ref"),
          when(col("dir") === 0, col("c.b")).otherwise(col("c.a"))
            .as("cur_end"))
        .withColumn("closed",
          col("cur_end") === col("start_ref") && size(col("refs")) >= 4)
        .select(stCols.map(col): _*)
      val extKeys = ext.select(col("rel_id"), col("role"), col("lbl"),
        lit(1).as("__x"))
      st = snap(
        st.join(extKeys, Seq("rel_id", "role", "lbl"), "left")
          .filter(col("__x").isNull).drop("__x")
          .unionByName(ext))
      // early exit when nothing is left to extend (r14-opt): every
      // remaining open ring is stuck or closed, so later rounds are
      // identity transforms — bit-identical to running all
      // `walkRounds` (still the documented oracle bound). The probe
      // joins two just-checkpointed tiny frames.
      walkDone = st.filter(!col("closed")).join(
          comp.withColumnRenamed("way_id", "cand_way"),
          Seq("rel_id", "role", "lbl"))
        .filter(!array_contains(col("used"), col("cand_way")) &&
          (col("a") === col("cur_end") || col("b") === col("cur_end")))
        .isEmpty
    }
    // —— ring index + exact o21 shoelace over the stitched sequence ——
    val wIdx = Window.partitionBy(col("rel_id"))
      .orderBy(col("role").desc, col("lbl")) // outers first, then min way
    val rings = graft.Caches.track(
      st.withColumn("ring_idx", row_number().over(wIdx).cast("int"))
        .withColumn("n_ways", size(col("used")).cast("int")))
    val nodes = planet.filter(col("type") === "node")
      .select(col("id").as("ref"),
        (col("lat") * lit(10000000)).cast("long").as("lat_nano"),
        (col("lon") * lit(10000000)).cast("long").as("lon_nano"))
    val wr = Window.partitionBy(col("rel_id"), col("ring_idx"))
      .orderBy(col("pos0"))
    val centered = rings
      .select(col("rel_id"), col("ring_idx"),
        posexplode(col("refs")).as(Seq("pos0", "ref")))
      .join(nodes, "ref")
      .withColumn("cx", col("lon_nano") - first(col("lon_nano")).over(wr))
      .withColumn("cy", col("lat_nano") - first(col("lat_nano")).over(wr))
      .withColumn("pcx", lag(col("cx"), 1).over(wr))
      .withColumn("pcy", lag(col("cy"), 1).over(wr))
      .withColumn("cr", col("pcx") * col("cy") - col("cx") * col("pcy"))
    val geo = centered.groupBy(col("rel_id"), col("ring_idx"))
      .agg(count(lit(1)).as("n_pts"), sum(col("cr")).as("a2"))
    rings.select(col("rel_id"), col("ring_idx"), col("role"),
        col("n_ways"), col("closed"))
      .join(geo, Seq("rel_id", "ring_idx"), "left")
      .select(col("rel_id"), col("ring_idx"), col("role"), col("n_ways"),
        col("closed"), col("n_pts"),
        when(col("closed"), abs(col("a2"))).as("area2_nano"),
        when(!col("closed"), lit("open"))
          .when(col("a2") > 0, "CCW").when(col("a2") < 0, "CW")
          .otherwise("degenerate").as("orientation"))
      .orderBy(col("rel_id"), col("ring_idx"))
  }

  /** Closed-way polygon area + winding (o21) — exact integer shoelace
    * over nanodegree coordinates, extending [[wayGeomStats]]'s
    * integer-geometry discipline from perimeters to areas: for every
    * closed ring (first nd ref == last, >= 4 entries), the signed
    * doubled area 2A = Σ (p_{i-1} × p_i) of coordinates ANCHORED at
    * the ring's first vertex. The anchor is the overflow guard —
    * shoelace is exactly translation-invariant in integer arithmetic,
    * and centered coordinates are ring-extent-sized, so every cross
    * product stays far inside int64 for real-world ways (raw
    * nanodegree products would sit at ~1.6e18, one addition from
    * overflow). x = lon, y = lat; positive sum = counter-clockwise.
    *
    * Like [[wayGeomStats]], refs that miss the node snapshot drop via
    * the inner join (both engines drop the same rows; closure is
    * judged on refs). Scale shape: one equi-join on node id + one
    * per-way window (population = way length) + one group-by — no
    * corpus-global term.
    */
  def polygonAreas(planet: DataFrame): DataFrame = {
    val nodes = planet.filter(col("type") === "node")
      .select(col("id").as("node_id"),
        (col("lat") * lit(10000000)).cast("long").as("lat_nano"),
        (col("lon") * lit(10000000)).cast("long").as("lon_nano"))
    val ways = planet.filter(col("type") === "way")
      .select(col("id").as("way_id"), posexplode(col("nds")).as(Seq("pos", "nd")))
      .select(col("way_id"), (col("pos") + 1).as("idx"), col("nd.ref").as("ref"))
    val closed = ways.groupBy(col("way_id"))
      .agg(max(col("idx")).as("n"),
        max(when(col("idx") === 1, col("ref"))).as("first_ref"),
        expr("max_by(ref, idx)").as("last_ref"))
      .filter(col("n") >= 4 && col("first_ref") === col("last_ref"))
      .select(col("way_id"))
    val w = Window.partitionBy(col("way_id")).orderBy(col("idx"))
    val centered = ways.join(closed, "way_id")
      .join(nodes, col("ref") === col("node_id"))
      .withColumn("cx", col("lon_nano") - first(col("lon_nano")).over(w))
      .withColumn("cy", col("lat_nano") - first(col("lat_nano")).over(w))
    val cross = centered
      .withColumn("pcx", lag(col("cx"), 1).over(w))
      .withColumn("pcy", lag(col("cy"), 1).over(w))
      .withColumn("cr", col("pcx") * col("cy") - col("cx") * col("pcy"))
    cross.groupBy(col("way_id"))
      .agg(count(lit(1)).as("n_pts"), sum(col("cr")).as("area2"))
      .select(col("way_id"), col("n_pts"),
        abs(col("area2")).as("area2_nano"),
        when(col("area2") > 0, "CCW").when(col("area2") < 0, "CW")
          .otherwise("degenerate").as("orientation"))
      .orderBy(col("way_id"))
  }

  /** Closed-way polygon centroid (o22) — o21's companion: the exact
    * RATIONAL centroid of each closed ring as integer shoelace-weighted
    * sums. With coordinates anchored at the ring's first vertex (the
    * o21 translation-invariance trick), Cx − anchor_x =
    * Σ(cx_i + cx_{i+1})·cr_i / (3·area2) where cr_i is the per-edge
    * cross term — so the frame carries (anchor, cx_num, cy_num, area2)
    * and the centroid is exactly anchor + num/(3·area2), divisions
    * deferred to the caller (emitting a floor-divided coordinate would
    * trip the truncate-vs-floor trap on negative numerators; the
    * rational IS the exact answer).
    *
    * Overflow + division discipline: a numerator term is
    * (≤2·extent)·(≤extent²) in anchored nanodegrees — the fixture's
    * degree-wide rings push the summed numerator past int64 — so
    * products sum in DECIMAL(38) (HUGEINT on the oracle side). The
    * final division emits the centroid FLOORED to whole nanodegrees
    * (±0.1 mm — the coordinate grid itself) through the m22 shift
    * trick: with den = 3·|area2| and the numerator sign-folded,
    * (num + SHIFT·den) div den − SHIFT divides a POSITIVE value, where
    * truncation and floor agree on every engine — the
    * truncate-vs-floor trap on negative numerators never opens. The
    * quotient (≤ SHIFT + 1.8e9) casts back to BIGINT exactly.
    *
    * Scale shape: o21's exactly — one per-way window pass over the
    * exploded nd list, then a map-combinable aggregate; ways
    * hash-partition and window population is per-way vertex count.
    */
  def polygonCentroids(planet: DataFrame): DataFrame = {
    val nodes = planet.filter(col("type") === "node")
      .select(col("id").as("node_id"),
        (col("lat") * lit(10000000)).cast("long").as("lat_nano"),
        (col("lon") * lit(10000000)).cast("long").as("lon_nano"))
    val ways = planet.filter(col("type") === "way")
      .select(col("id").as("way_id"), posexplode(col("nds")).as(Seq("pos", "nd")))
      .select(col("way_id"), (col("pos") + 1).as("idx"), col("nd.ref").as("ref"))
    val closed = ways.groupBy(col("way_id"))
      .agg(max(col("idx")).as("n"),
        max(when(col("idx") === 1, col("ref"))).as("first_ref"),
        expr("max_by(ref, idx)").as("last_ref"))
      .filter(col("n") >= 4 && col("first_ref") === col("last_ref"))
      .select(col("way_id"))
    val w = Window.partitionBy(col("way_id")).orderBy(col("idx"))
    val centered = ways.join(closed, "way_id")
      .join(nodes, col("ref") === col("node_id"))
      .withColumn("ax", first(col("lon_nano")).over(w))
      .withColumn("ay", first(col("lat_nano")).over(w))
      .withColumn("cx", col("lon_nano") - col("ax"))
      .withColumn("cy", col("lat_nano") - col("ay"))
    val cross = centered
      .withColumn("pcx", lag(col("cx"), 1).over(w))
      .withColumn("pcy", lag(col("cy"), 1).over(w))
      .withColumn("cr",
        (col("pcx") * col("cy") - col("cx") * col("pcy")).cast("decimal(25,0)"))
    val agg = cross.groupBy(col("way_id"))
      .agg(count(lit(1)).as("n_pts"),
        max(col("ax")).as("ax"),
        max(col("ay")).as("ay"),
        sum(col("cr")).as("area2d"),
        sum(((col("pcx") + col("cx")).cast("decimal(12,0)") * col("cr")))
          .as("cx_num"),
        sum(((col("pcy") + col("cy")).cast("decimal(12,0)") * col("cr")))
          .as("cy_num"))
      .filter(col("area2d") =!= 0) // degenerate rings have no centroid
    // floor-divide in decimal space: den > 0, numerator shifted positive
    val shift = 2000000000L // 200 degrees in nano — exceeds any offset
    def floored(num: String): Column = expr(
      s"""CAST((CASE WHEN area2d < 0 THEN -$num ELSE $num END +
         |  CAST($shift AS DECIMAL(38,0)) * (3 * abs(area2d)))
         |  div (3 * abs(area2d)) AS BIGINT) - $shift""".stripMargin)
    agg.select(col("way_id"), col("n_pts"),
        col("area2d").cast("long").as("area2"),
        (col("ax") + floored("cx_num")).as("cen_lon_nano"),
        (col("ay") + floored("cy_num")).as("cen_lat_nano"))
      .orderBy(col("way_id"))
  }

  /** README.md:158-159 (recommended window form) — per-element tag-value
    * transitions across versions for one key: value, previous value.
    */
  def tagTransitions(history: DataFrame, tagKey: String): DataFrame = {
    val w = Window.partitionBy(col("type"), col("id")).orderBy(col("version"))
    history
      .select(col("type"), col("id"), col("version"),
        col("tags").getItem(tagKey).as("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("value").isNotNull && (col("prev_value").isNull ||
        col("prev_value") =!= col("value")))
  }
}
