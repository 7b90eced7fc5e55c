package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** s23/s24/s25 — the graph-analytics family over the s16 corpus k-NN
  * graph, each checked against an INDEPENDENT driver-side recompute
  * (plain Scala adjacency sets) from the same edge list, the
  * DbscanSpec discipline: the distributed plan and a sequential
  * reference must agree vertex-by-vertex.
  */
class GraphAnalyticsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The s16 directed top-k edge list, collected once. */
  private lazy val directed: Set[(Long, Long)] =
    Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("src")), r.getLong(r.fieldIndex("dst"))))
      .toSet

  /** Undirected canonical edges (the s23/s24 view). */
  private lazy val und: Set[(Long, Long)] =
    directed.map { case (a, b) => (math.min(a, b), math.max(a, b)) }

  private def adjacency(edges: Set[(Long, Long)]): Map[Long, Set[Long]] = {
    val m = scala.collection.mutable.Map.empty[Long, Set[Long]]
    edges.foreach { case (a, b) =>
      m(a) = m.getOrElse(a, Set.empty) + b
      m(b) = m.getOrElse(b, Set.empty) + a
    }
    m.toMap
  }

  test("s23: degrees and triangle counts match a sequential recompute") {
    val adj = adjacency(und)
    val got = Similarity.triangleCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.size should be > 0
    // every corpus vertex appears exactly once
    val ids = graft.Tables.embeddings(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    got.keySet shouldBe ids
    ids.foreach { v =>
      val nbrs = adj.getOrElse(v, Set.empty)
      val tri = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      got(v) shouldBe ((nbrs.size.toLong, tri.toLong))
    }
    // the graph genuinely has triangles at this sf (non-vacuous test)
    got.values.map(_._2).sum should be > 0L
  }

  test("s24: labels match a sequential synchronous LPA, 3 rounds") {
    val adj = adjacency(und)
    val ids = graft.Tables.embeddings(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).sorted
    var lbl: Map[Long, Long] = ids.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      val next = ids.map { v =>
        val nbrs = adj.getOrElse(v, Set.empty)
        if (nbrs.isEmpty) v -> lbl(v)
        else {
          val counts = nbrs.toSeq.map(lbl).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }
          // (count DESC, label ASC) argmax — the operator's tiebreak
          val pick = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
          v -> pick
        }
      }.toMap
      lbl = next
    }
    val got = Similarity.labelPropagation(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe lbl
    // labels collapsed into genuine communities (fewer labels than ids)
    got.values.toSet.size should be < ids.length
  }

  test("s25: survivors = the true mutual 2-core fixpoint, degrees exact") {
    // mutual restriction: both directions present in the directed top-k
    val mutual = directed.filter { case (a, b) => a < b && directed.contains((b, a)) }
    val adj = adjacency(mutual)
    // sequential peel to the TRUE fixpoint (no round bound)
    var alive = adj.keySet
    var changed = true
    var itersNeeded = 0
    while (changed) {
      val next = alive.filter(v => adj(v).count(alive.contains) >= 2)
      changed = next != alive
      alive = next
      itersNeeded += 1
    }
    // the operator's fixed 10 rounds must cover this sf's cascade
    itersNeeded should be <= 10
    val got = Similarity.kCorePeel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.keySet shouldBe alive
    alive.foreach { v =>
      got(v) shouldBe adj(v).count(alive.contains).toLong
      got(v) should be >= 2L // the defining k-core property
    }
    // non-vacuous both ways: something survived, something was peeled
    got.size should be > 0
    got.size should be < adj.size
  }

  test("s26: link-prediction scores match a sequential recompute") {
    val adj = adjacency(und)
    val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
    // every non-edge pair with >= 1 common neighbor, canonical a < b
    val scores = (for {
      (z, ns) <- adj.toSeq
      pair <- ns.toSeq.sorted.combinations(2)
    } yield (pair(0), pair(1), z))
      .filter { case (a, b, _) => !und.contains((a, b)) }
      .groupBy { case (a, b, _) => (a, b) }
      .map { case ((a, b), ws) =>
        val cn = ws.size.toLong
        val ra = ws.map { case (_, _, z) => 1000000L / deg(z) }.sum
        (a, b, cn, ra, deg(a) * deg(b))
      }.toSeq
    val expTop = scores
      .sortBy { case (a, b, cn, ra, _) => (-cn, -ra, a, b) }
      .take(50)
    val got = Similarity.linkPrediction(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    got.toSeq shouldBe expTop
    // non-vacuous: candidates exist and at least one has cn >= 2
    got.length should be > 0
    got.map(_._3).max should be >= 2L
  }

  test("s38: personalized PageRank matches a sequential sparse walk") {
    val got = Similarity.personalizedPageRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.Caches.releaseAll(spark)
    got should not be empty
    // sequential reference: same directed edges, same fixed-point
    // sparse update, 3 rounds, 8 seeds
    val outdeg = directed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val seeds = (0L until 8L).toSeq
    val exp = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (seed <- seeds) {
      var pr = Map(seed -> 1000000L)
      for (_ <- 1 to 3) {
        val in = scala.collection.mutable.Map.empty[Long, Long]
        for ((src, dst) <- directed; mass <- pr.get(src))
          in(dst) = in.getOrElse(dst, 0L) + mass / outdeg(src)
        val damped = in.toMap.view.mapValues(m => 85 * m / 100).toMap
        pr = damped + (seed -> (damped.getOrElse(seed, 0L) + 150000L))
      }
      pr.filter(_._2 > 0).foreach { case (v, m) => exp((seed, v)) = m }
    }
    got shouldBe exp.toMap
    // the restart mass law: every seed holds at least its own restart
    seeds.foreach { s => got((s, s)) should be >= 150000L }
    // personalization is real: mass stays LOCAL — each seed reaches a
    // strict subset of the corpus, and different seeds differ
    val ids = graft.Tables.embeddings(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    seeds.foreach { s =>
      val reached = got.keySet.filter(_._1 == s).map(_._2)
      reached.size should be < ids.size
    }
    val reachSets = seeds.map(s => got.keySet.filter(_._1 == s).map(_._2))
    reachSets.distinct.length should be > 1
  }

  test("s42: assortativity matches the q64 moment algebra on in-degrees") {
    val row = Similarity.degreeAssortativity(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    row.length shouldBe 1
    val indeg = directed.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val xy = directed.toSeq.map { case (s, d) =>
      (indeg.getOrElse(s, 0L), indeg(d))
    }
    val n = BigInt(xy.length)
    val sx = xy.map(p => BigInt(p._1)).sum
    val sy = xy.map(p => BigInt(p._2)).sum
    val num = n * xy.map(p => BigInt(p._1) * p._2).sum - sx * sy
    val dx = n * xy.map(p => BigInt(p._1) * p._1).sum - sx * sx
    val dy = n * xy.map(p => BigInt(p._2) * p._2).sum - sy * sy
    row(0).getLong(0) shouldBe xy.length.toLong
    row(0).getInt(1) shouldBe num.signum
    if (dx == 0 || dy == 0) row(0).isNullAt(2) shouldBe true
    else {
      val r2 = (num * num / dx * 1000000 / dy).toLong
      row(0).getLong(2) shouldBe r2
      r2 should (be >= 0L and be <= 1000000L)
    }
  }

  test("s43: label assortativity matches Newman's categorical recompute") {
    val row = Similarity.labelAssortativity(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    row.length shouldBe 1
    val labels = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val el = directed.toSeq.map { case (s, d) => (labels(s), labels(d)) }
    val n = BigInt(el.length)
    val same = el.count { case (a, b) => a == b }.toLong
    val aC = el.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val bC = el.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sab = aC.keySet.intersect(bC.keySet).toSeq
      .map(l => BigInt(aC(l)) * bC(l)).sum
    val num = BigInt(same) * n - sab
    val den = n * n - sab
    row(0).getLong(0) shouldBe el.length.toLong
    row(0).getLong(1) shouldBe same
    if (den == 0) row(0).isNullAt(2) shouldBe true
    else {
      val r = if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)
      row(0).getLong(2) shouldBe r.toLong
      r.toLong should (be >= -1000000L and be <= 1000000L)
    }
    // labels genuinely mix non-randomly on this corpus (embedding
    // clusters carry labels): the diagonal is non-empty
    same should be > 0L
  }

  test("s39: HITS matches a sequential synchronous recompute") {
    val got = Similarity.hits(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.Caches.releaseAll(spark)
    val ids = graft.Tables.embeddings(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    got.keySet shouldBe ids
    var hub = ids.map(_ -> 1L).toMap
    var auth = ids.map(_ -> 1L).toMap
    for (_ <- 1 to 3) {
      val nh = scala.collection.mutable.Map.empty[Long, Long]
      val na = scala.collection.mutable.Map.empty[Long, Long]
      for ((u, v) <- directed) {
        nh(u) = nh.getOrElse(u, 0L) + auth(v)
        na(v) = na.getOrElse(v, 0L) + hub(u)
      }
      hub = ids.map(i => i -> nh.getOrElse(i, 0L)).toMap
      auth = ids.map(i => i -> na.getOrElse(i, 0L)).toMap
    }
    ids.foreach { v => got(v) shouldBe ((hub(v), auth(v))) }
    // the top-k graph is genuinely directed: the two centralities split
    got.values.exists { case (h, a) => h != a } shouldBe true
    // every vertex has out-degree k, so hubs never vanish; authorities
    // DO vanish exactly at vertices nobody points to
    got.values.foreach { case (h, _) => h should be > 0L }
    val inDeg = directed.groupBy(_._2).view.mapValues(_.size).toMap
    ids.foreach { v =>
      (got(v)._2 == 0L) shouldBe !inDeg.contains(v)
    }
  }
}
