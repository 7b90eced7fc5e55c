package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** q40 FK audit, q41 exact k-th selection, p15 weighted sample, d25
  * edit-distance join — each pinned against an independent sequential
  * recompute or a synthetic frame that exercises the failure mode the
  * operator exists to catch.
  */
class QualityOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Independent Levenshtein (classic two-row DP) for the d25 check —
    * NOT Spark's implementation.
    */
  private def lev(a: String, b: String): Int = {
    var prev = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length)
  }

  test("d25: matches a brute-force DP recompute over all distinct names") {
    val names = graft.Tables.part(spark, sf).select("p_name")
      .distinct().collect().map(_.getString(0)).sorted
    val expected = (for {
      i <- names.indices; j <- (i + 1) until names.length
      d = lev(names(i), names(j)) if d <= 2
    } yield (names(i), names(j), d)).toSet
    val got = Dedup.editDistanceJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    got shouldBe expected
    expected.size should be > 0
  }

  test("d25: short strings (below the count-filter bound) are not lost") {
    import spark.implicits._
    // "ab"/"ac" share NO 2-gram yet are within distance 1 — the pairs
    // an ngram-only candidate pass silently drops; "abcdefgh" pairs
    // exercise the long class in the same frame
    val strings = Seq("ab", "ac", "b", "abcdefgh", "abcdefxh", "zzzzzzzz")
      .toDF("s")
    val got = Dedup.editDistanceJoinOn(strings).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val all = Seq("ab", "ac", "b", "abcdefgh", "abcdefxh", "zzzzzzzz").sorted
    val expected = (for {
      i <- all.indices; j <- (i + 1) until all.length
      d = lev(all(i), all(j)) if d <= 2
    } yield (all(i), all(j), d)).toSet
    got shouldBe expected
    // the cross-class pair (short "ab" against nothing long) plus the
    // in-short pairs must include the no-shared-gram case
    got.map(p => (p._1, p._2)) should contain ("ab", "ac")
  }

  test("d27: positional-segment candidates survive adversarial shifts") {
    import spark.implicits._
    // edits concentrated in ONE segment; ±1-length front insert/delete
    // (every segment of the shorter shifts — the window's stress case);
    // sub-(t+1)-length strings exercising zero-length segments
    val strings = Seq(
      "abcdefghi", "abcXYfghi",       // both edits inside segment 1
      "Xabcdefghi",                   // front insert: all segments shift +1
      "bcdefghi",                     // front delete: all segments shift -1
      "abcdefgXY", "XYcdefghi",       // edits at either end
      "ab", "ac", "b",                // short class via empty segments
      "zzzzzzzzz").toDF("s")
    val got = Dedup.editDistanceSegmentsOn(strings, 2,
      graft.operators.Sizing.MaxPairKeyPopulation).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val all = Seq("abcdefghi", "abcXYfghi", "Xabcdefghi", "bcdefghi",
      "abcdefgXY", "XYcdefghi", "ab", "ac", "b", "zzzzzzzzz").sorted
    val expected = (for {
      i <- all.indices; j <- (i + 1) until all.length
      d = lev(all(i), all(j)) if d <= 2
    } yield (all(i), all(j), d)).toSet
    got shouldBe expected
    // the stress pairs really are in the truth set (non-vacuous)
    expected.map(p => (p._1, p._2)) should contain ("abcXYfghi", "abcdefghi")
    expected.map(p => (p._1, p._2)) should contain ("Xabcdefghi", "abcdefghi")
    expected.map(p => (p._1, p._2)) should contain ("abcdefghi", "bcdefghi")
  }

  test("d27 and d25 agree pair-for-pair on the shared name domain") {
    // two INDEPENDENT lossless candidate generators (n-gram count
    // filter vs positional segments) must produce the identical
    // verified pair set
    val names = graft.Tables.part(spark, sf).select(col("p_name").as("s"))
    val ngram = Dedup.editDistanceJoinOn(names).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val seg = Dedup.editDistanceSegmentsOn(names, 2,
      graft.operators.Sizing.MaxPairKeyPopulation).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    seg shouldBe ngram
    seg.size should be > 0
  }

  test("q41: exact kth matches a full-sort recompute, all three ranks") {
    val vals = graft.Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100, 0).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    val n = vals.length.toLong
    val got = Relational.exactKth(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for (q <- Seq(25, 50, 75)) {
      val k = (q * n + 99) / 100
      got(s"p$q") shouldBe ((n, k, vals((k - 1).toInt)))
    }
  }

  test("q40: synthetic orphans and NULL keys are counted as distinct keys") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(7L), Some(8L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = Relational.fkAuditOne("t.p", child, "ck", parent, "pk")
      .collect().head
    row.getString(0) shouldBe "t.p"
    row.getLong(1) shouldBe 6L // child_rows
    row.getLong(2) shouldBe 1L // null_keys
    row.getLong(3) shouldBe 4L // distinct non-null keys
    row.getLong(4) shouldBe 2L // orphaned DISTINCT keys: 7, 8
  }

  test("q42: intervals tile each user's timeline exactly") {
    val rows = Relational.scd2Intervals(spark, sf).collect()
    rows.length should be > 0
    rows.groupBy(_.getLong(0)).values.foreach { vs =>
      val sorted = vs.sortBy(_.getInt(1))
      // versions contiguous from 1
      sorted.map(_.getInt(1)).toSeq shouldBe (1 to vs.length)
      // each version's valid_to == the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          a.getLong(a.fieldIndex("valid_to_us")) shouldBe
            b.getLong(b.fieldIndex("valid_from_us"))
        case _ =>
      }
      // exactly the LAST version is open-ended
      sorted.dropRight(1).foreach(r =>
        r.isNullAt(r.fieldIndex("valid_to_us")) shouldBe false)
      sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")) shouldBe true
    }
  }

  test("q43: merged partials equal a single-pass aggregate, any split") {
    def direct = {
      val ev = graft.Tables.events(spark, sf)
        .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("c"))
      ev.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("c").as("sum_cents"),
          min("c").as("min_cents"), max("c").as("max_cents"))
        .select(col("user_id"), col("n"), col("sum_cents"),
          col("min_cents"), col("max_cents"),
          round(col("sum_cents") / col("n"), 6).as("avg_cents"))
        .collect().map(_.toSeq).toSet
    }
    // two different split dates — the merge law is split-invariant
    for (split <- Seq("2024-01-10", "2024-01-25")) {
      Relational.incrementalAgg(spark, sf, split)
        .collect().map(_.toSeq).toSet shouldBe direct
    }
    // degenerate split: empty delta (everything in base) still merges
    Relational.incrementalAgg(spark, sf, "2030-01-01")
      .collect().map(_.toSeq).toSet shouldBe direct
  }

  test("q44: union sketch equals the sketch of the union (merge law); " +
      "estimates bracket the exact cardinalities") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val h = docs
      .select(col("lang"), explode(graft.functions.Text.toks(col("text"))).as("tok"))
      .select(col("lang"), md5(col("tok").cast("binary")).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val byLang = h.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = Relational.kmvSetOps(spark, sf).collect()
    rows.length shouldBe byLang.size * (byLang.size - 1) / 2
    rows.foreach { r =>
      val (la, lb) = (r.getString(0), r.getString(1))
      val (sa, sb) = (byLang(la), byLang(lb))
      // merge law: the operator's merged bottom-k == bottom-k of the
      // TRUE union, recomputed independently
      val trueUnionBottomK = (sa ++ sb).toSeq.sorted.take(32)
      r.getString(r.fieldIndex("kth_u")) shouldBe trueUnionBottomK.last
      // estimator sanity: within 60% of exact at k=32 (stderr ~ 1/sqrt(30)
      // per KMV theory; 60% is ~3 sigma — deterministic here, just wide)
      val exactU = (sa ++ sb).size.toDouble
      val exactI = (sa intersect sb).size.toDouble
      val estU = r.getDouble(r.fieldIndex("est_union"))
      val estI = r.getDouble(r.fieldIndex("est_inter"))
      estU should be > exactU * 0.4
      estU should be < exactU * 1.6
      if (exactI > 0) {
        estI should be > exactI * 0.2
        estI should be < exactI * 2.5
      }
    }
    // non-vacuous: vocabularies genuinely overlap
    rows.map(_.getInt(rows.head.fieldIndex("rho"))).sum should be > 0
  }

  test("d26: planted subset is found in ONE direction only; corpus " +
      "result matches a brute-force directed recompute") {
    import spark.implicits._
    // planted: doc 1's shingles are a strict subset of doc 2's FIVE
    // (reverse containment 2/5 = 0.4 stays below τ = 0.5)
    val sh = Seq(
      (1L, "a b c"), (1L, "b c d"),
      (2L, "a b c"), (2L, "b c d"), (2L, "d e f"), (2L, "e f g"), (2L, "f g h"),
      (3L, "x y z")).toDF("doc_id", "sh")
    val planted = Dedup.containmentOn(sh, 1, 2,
      graft.operators.Sizing.MaxPairKeyPopulation).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    planted.map(p => (p._1, p._2)) should contain ((1L, 2L)) // 2/2 contained
    planted.map(p => (p._1, p._2)) should not contain ((2L, 1L)) // 2/5 < τ
    planted.find(p => (p._1, p._2) == ((1L, 2L))).get._3 shouldBe 1.0
    // corpus: distributed result == brute force over collected sets
    val corpus = Dedup.containmentJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sets = graft.operators.Dedup.shingleSet(spark, sf, None)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a != b
      ic = (sets(a) intersect sets(b)).size
      if BigDecimal(ic.toDouble / sets(a).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.5")
    } yield (a, b, ic.toLong)).toSet
    corpus shouldBe brute
    corpus.size should be > 0
  }

  test("q45: funnel counts match a sequential per-user replay and are monotone") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val byUser = evs.groupBy(_._1)
    def anchored(step: String, prev: Map[Long, java.sql.Timestamp]): Map[Long, java.sql.Timestamp] =
      byUser.flatMap { case (u, es) =>
        prev.get(u).flatMap { t0 =>
          val nexts = es.filter(e => e._2 == step && e._3.after(t0)).map(_._3)
          if (nexts.isEmpty) None else Some(u -> nexts.min)
        }
      }.toMap
    val epoch = new java.sql.Timestamp(-62135596800000L) // before everything
    val v = anchored("view", byUser.keys.map(_ -> epoch).toMap)
    val c = anchored("click", v)
    val p = anchored("purchase", c)
    val got = Relational.funnelSteps(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    got shouldBe Map(1 -> v.size.toLong, 2 -> c.size.toLong, 3 -> p.size.toLong)
    got(1) should be >= got(2)
    got(2) should be >= got(3)
    got(3) should be > 0L // non-vacuous: full conversions exist
  }

  test("p15: draws equal the min ticket key; heavier docs win more") {
    val got = Sampling.weightedSample(spark, sf, m = 30).collect()
    got.length shouldBe 30
    // independent recompute of every doc's draw
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val draws = docs.map { case (id, nc) =>
      val w = math.max(math.min((nc + 99) / 100, 20L), 1L).toInt
      id -> ((1 to w).map(t => md5hex(s"wt:$id:$t")).min, w)
    }
    val expected = draws.toSeq.sortBy { case (id, (d, _)) => (d, id) }
      .take(30).zipWithIndex
      .map { case ((id, (d, w)), i) => (i + 1, id, w, d) }
    got.map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .toSeq shouldBe expected
    // weighting is real: mean weight among winners exceeds corpus mean
    val meanAll = draws.values.map(_._2).sum.toDouble / draws.size
    val meanWin = expected.map(_._3).sum.toDouble / expected.size
    meanWin should be > meanAll
  }

  test("q46: flagged outliers match a sequential median/MAD recompute") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select($"event_id", $"event_type",
        round($"value" * 100, 0).cast("bigint").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def lowerMedian(xs: Seq[(Long, Long)]): Long = {
      // (sortKeyId, value) pairs ordered by (value, id); rank (n+1)/2
      val s = xs.sortBy { case (id, v) => (v, id) }
      s(((s.size + 1) / 2) - 1)._2
    }
    val byGrp = ev.groupBy(_._2)
    val exp = byGrp.flatMap { case (grp, rows) =>
      val med = lowerMedian(rows.map(r => (r._1, r._3)).toSeq)
      val devs = rows.map(r => (r._1, r._3, math.abs(r._3 - med))).toSeq
      val mad = lowerMedian(devs.map(d => (d._1, d._3)))
      if (mad == 0) Nil
      else devs.filter(d => d._3 * 6745 > mad * 35000L)
        .map(d => (grp, d._1, d._2, med, mad, d._3))
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Relational.robustOutliers(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe exp
    // non-vacuous: every event-type group flags at least one outlier
    got.map(_._1).distinct.sorted shouldBe byGrp.keys.toSeq.sorted
    // a tighter threshold is strictly more sensitive (the param is live)
    val loose = Relational.robustOutliers(spark, sf, threshMilli = 1200)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    got.map(t => (t._1, t._2)).toSet.subsetOf(loose) shouldBe true
    loose.size should be > got.length
  }

  test("q48: slope fractions match a sequential moments recompute and the " +
    "float OLS sign; re-centering leaves the fraction value invariant") {
    import spark.implicits._
    val daily = graft.Tables.events(spark, sf)
      .select($"event_type".as("grp"),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date")).as("day"),
        round($"value" * 100, 0).cast("bigint").as("cents"))
      .groupBy($"grp", $"day").agg(sum($"cents").as("y"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val exp = daily.groupBy(_._1).map { case (grp, rows) =>
      val d0 = rows.map(_._2).min
      val xs = rows.map(r => (r._2 - d0, r._3))
      val n = xs.length.toLong
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val sxx = xs.map(t => t._1 * t._1).sum
      val sxy = xs.map(t => t._1 * t._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      (grp, n.toInt, num, den, if (den == 0) 0 else java.lang.Long.signum(num))
    }.toSeq.sortBy(_._1)
    val got = Relational.groupTrend(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    got shouldBe exp
    // the integer fraction agrees in sign with a double-precision OLS
    // (guards the cleared-denominator algebra against a sign slip)
    daily.groupBy(_._1).foreach { case (grp, rows) =>
      val xm = rows.map(_._2.toDouble).sum / rows.size
      val ym = rows.map(_._3.toDouble).sum / rows.size
      val cov = rows.map(r => (r._2 - xm) * (r._3 - ym)).sum
      val g = got.find(_._1 == grp).get
      if (g._4 != 0) math.signum(cov).toInt shouldBe g._5
    }
    // non-vacuous: multi-day groups exist and at least one real trend fires
    all(got.map(_._2)) should be > 1
    got.map(_._5).exists(_ != 0) shouldBe true
    // the fraction is the re-centering-invariant form: replaying WITHOUT
    // re-centering (raw epoch days) yields the identical num/den
    val expRaw = daily.groupBy(_._1).map { case (grp, rows) =>
      val xs = rows.map(r => (r._2, r._3))
      val n = xs.length.toLong
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val num = n * xs.map(t => t._1 * t._2).sum - sx * sy
      val den = n * xs.map(t => t._1 * t._1).sum - sx * sx
      (grp, num, den)
    }.toSeq.sortBy(_._1)
    expRaw shouldBe got.map(t => (t._1, t._3, t._4))
  }

  test("q49: chain counts match a sequential per-user replay; ties never " +
    "chain and the gap parameter is monotone") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gap = 360L * 60 * 1000000
    val exp = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val v = rows.filter(_._2 == "view").map(_._3)
      val c = rows.filter(_._2 == "click").map(_._3)
      val p = rows.filter(_._2 == "purchase").map(_._3)
      val chains = for {
        vu <- v; cu <- c if cu > vu && cu - vu <= gap
        pu <- p if pu > cu && pu - cu <= gap
      } yield (vu, pu)
      if (chains.isEmpty) None
      else Some((u, chains.size.toLong, chains.map(_._1).min, chains.map(_._2).max))
    }.toSeq.sortBy(_._1)
    val got = Relational.gapChains(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe exp
    got.map(_._2).sum should be > 0L
    // a wider gap admits a superset of chains, user by user
    val wide = Relational.gapChains(spark, sf, gapMin = 100000).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    got.foreach { case (u, n, _, _) => wide(u) should be >= n }
    wide.values.sum should be > got.map(_._2).sum
    // strict >: a zero-width gap can never chain distinct-timestamp
    // steps AND ties are excluded by construction — replay with ties
    // allowed must not change anything on this corpus unless equal
    // timestamps exist across the step types (they don't; pinned)
    val tied = ev.groupBy(_._1).exists { case (_, rows) =>
      val ts = rows.groupBy(_._3)
      ts.exists(_._2.map(_._2).distinct.size > 1)
    }
    tied shouldBe false
  }

  test("q50: the windowed CUSUM equals the literal clamped recursion " +
    "replayed sequentially, alarms included") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        round($"value" * 100, 0).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val mu = ev.map(_._4).sum / ev.length // values non-negative: / == div
    val thresh = 100000L
    val exp = ev.groupBy(_._1).map { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var s = 0L
      var maxS = Long.MinValue
      var alarm: Option[Int] = None
      ordered.zipWithIndex.foreach { case ((_, _, _, cents), i) =>
        s = math.max(0L, s + (cents - mu)) // the textbook recursion
        maxS = math.max(maxS, s)
        if (alarm.isEmpty && s >= thresh) alarm = Some(i + 1)
      }
      (uid, (ordered.length.toLong, maxS, alarm))
    }
    val got = Relational.cusumChart(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))).toMap
    got shouldBe exp
  }

  test("q47: boundaries sit at exact ceil(i*n/B) ranks of a full sort; " +
    "bucket populations balance") {
    import spark.implicits._
    val vs = graft.Tables.lineitem(spark, sf)
      .select(round($"l_extendedprice" * 100, 0).cast("bigint").as("v"),
        $"l_orderkey", $"l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(identity)
    val n = vs.length.toLong
    val b = 16
    val exp = (1 to b).map { i =>
      val k = (i * n + b - 1) / b
      (i, k, vs((k - 1).toInt)._1)
    }
    val got = Relational.equiDepthHistogram(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    got.toSeq shouldBe exp
    // equal depth is real: consecutive rank gaps differ by at most 1
    val gaps = (exp.map(_._2) zip (0L +: exp.map(_._2))).map(p => p._1 - p._2)
    gaps.max - gaps.min should be <= 1L
    // and the last boundary is the corpus max
    exp.last._3 shouldBe vs.last._1
  }

  test("q51: bitmap intersections equal true set intersections, " +
    "pair-for-pair, and no overlapping pair is missing") {
    val du = graft.Tables.events(spark, sf)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = du.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).toSet
    }
    val got = Relational.bitmapOverlap(spark, sf).collect()
    got should not be empty
    for (r <- got) {
      val ta = r.getString(r.fieldIndex("type_a"))
      val tb = r.getString(r.fieldIndex("type_b"))
      withClue(s"$ta x $tb: ") {
        ta should be < tb
        val (sa, sb) = (byType(ta), byType(tb))
        r.getLong(r.fieldIndex("n_a")) shouldBe sa.size.toLong
        r.getLong(r.fieldIndex("n_b")) shouldBe sb.size.toLong
        r.getLong(r.fieldIndex("n_both")) shouldBe (sa & sb).size.toLong
      }
    }
    // completeness: every pair with a non-empty intersection appears
    val types = byType.keys.toSeq.sorted
    val expectPairs = (for {
      ta <- types; tb <- types
      if ta < tb && (byType(ta) & byType(tb)).nonEmpty
    } yield (ta, tb)).toSet
    got.map(r => (r.getString(r.fieldIndex("type_a")),
      r.getString(r.fieldIndex("type_b")))).toSet shouldBe expectPairs
  }

  test("q52: RANGE frames equal a brute-force per-user interval scan") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        round($"value" * 100, 0).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = evs.groupBy(_._1)
    val hourUs = 3600L * 1000000
    val tenMinUs = 600L * 1000000
    val got = Relational.trailingRangeWindow(spark, sf).collect()
    got.length shouldBe evs.length
    for (r <- got) {
      val (uid, eid, us) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val peers = byUser(uid)
      // brute force: every event of the user within the value window
      val back = peers.filter(p => p._3 >= us - hourUs && p._3 <= us)
      val fwd = peers.filter(p => p._3 >= us && p._3 <= us + tenMinUs)
      withClue(s"user $uid event $eid: ") {
        r.getLong(r.fieldIndex("n_hour_back")) shouldBe back.length.toLong
        r.getLong(r.fieldIndex("cents_hour_back")) shouldBe back.map(_._4).sum
        r.getLong(r.fieldIndex("n_10m_fwd")) shouldBe fwd.length.toLong
      }
    }
    // the frames are non-trivial: some window really holds >1 event
    got.map(_.getLong(3)).max should be > 1L
  }

  test("q53: two-phase upsert equals a full latest-wins recompute, " +
      "and tombstones really delete") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        $"event_type", round($"value" * 100, 0).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    // independent sequential recompute: latest row per user, keep if
    // it is not a delete
    val expect = evs.groupBy(_._1).flatMap { case (uid, rows) =>
      val last = rows.maxBy(r => (r._3, r._2))
      if (last._4 == "error") None
      else Some((uid, last._2, last._3, last._5))
    }.toSet
    val got = Relational.mergeUpsert(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe expect
    // the tombstone path is non-vacuous: some user's final op IS a
    // delete, so that user must be absent from the merged state
    val deleted = evs.groupBy(_._1).filter { case (_, rows) =>
      rows.maxBy(r => (r._3, r._2))._4 == "error"
    }.keySet
    deleted should not be empty
    got.map(_._1).intersect(deleted) shouldBe empty
  }

  test("q54: carry-forward PIT join equals brute-force interval containment") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sf)
      .filter($"user_id" < 100)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        round($"value" * 100, 0).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute-force SCD2 versions per user
    val versions = evs.groupBy(_._1).map { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      uid -> sorted.zipWithIndex.map { case (r, i) =>
        val to = if (i + 1 < sorted.length) Some(sorted(i + 1)._3) else None
        (i + 1, r._3, to, r._4) // (version, from, to, cents)
      }
    }
    val got = Relational.pitJoin(spark, sf).collect()
    val probes = evs.filter(_._2 % 7 == 0)
    got.length shouldBe probes.length
    for (r <- got) {
      val (uid, pus) = (r.getLong(0), r.getLong(2))
      val hit = versions(uid).find { case (_, from, to, _) =>
        pus >= from && to.forall(pus < _)
      }
      withClue(s"user $uid probe_us $pus: ") {
        hit match {
          case Some((v, _, _, c)) =>
            r.getInt(r.fieldIndex("pit_version")) shouldBe v
            r.getLong(r.fieldIndex("pit_value_cents")) shouldBe c
          case None =>
            r.isNullAt(r.fieldIndex("pit_version")) shouldBe true
            r.isNullAt(r.fieldIndex("pit_value_cents")) shouldBe true
        }
      }
    }
    // both branches occur: some probe precedes version 1 (NULL), some
    // probe lands inside a real interval
    got.count(_.isNullAt(3)) should be > 0
    got.count(!_.isNullAt(3)) should be > 0
  }

  test("q55: skew advisor matches a sequential per-key fan-out recompute") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val lc = evs.groupBy(_._1).map { case (u, r) => u -> r.length.toLong }
    val rc = evs.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, r) => u -> r.length.toLong }
    val fan = lc.keySet.intersect(rc.keySet).toSeq
      .map(u => (u, lc(u), rc(u), lc(u) * rc(u)))
    val total = fan.map(_._4).sum
    val expect = fan.sortBy(r => (-r._4, r._1)).take(10).zipWithIndex
      .map { case ((u, nl, nr, f), i) =>
        (i + 1, u, nl, nr, f, total, f * 1000000L / total) }
    val got = Relational.joinSkewAdvisor(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got shouldBe expect
    // the audit is non-trivial: the top key's share exceeds a uniform
    // share (the advisor would otherwise never name a salting target)
    got.head._7 should be > (1000000L / fan.length)
  }

  test("q57: transition matrix matches a sequential per-user replay") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans: Seq[(String, String)] = evs.groupBy(_._1).toSeq
      .flatMap { case (_, rows) =>
        val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
        if (ordered.length < 2) Seq.empty[(String, String)]
        else ordered.zip(ordered.tail)
      }
    val cnt = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rowN = cnt.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val expect = cnt.toSeq.map { case ((p, nx), n) =>
      (p, nx, n, rowN(p), n * 1000000L / rowN(p))
    }.sortBy(r => (r._1, r._2))
    val got = Relational.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe expect
    // ppm rows under-sum by at most |row| floor losses, never over
    for ((p, rows) <- got.groupBy(_._1)) withClue(s"prev $p: ") {
      val s = rows.map(_._5).sum
      s should be <= 1000000L
      s should be > 1000000L - rows.length
    }
  }

  test("q58: multi-touch shares split each purchase's 10^6 exactly, " +
      "with the remainder on the earliest touches") {
    import spark.implicits._
    // sf0.01: the only scale whose window populations include a k
    // that does NOT divide 10^6 (one k=3 purchase) — the remainder
    // branch must be exercised, not just compiled
    val sf01 = "/root/testdata/sf0.01"
    val got = Relational.multiTouchAttribution(spark, sf01).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got should not be empty
    for ((pid, rows) <- got.groupBy(_._1)) withClue(s"purchase $pid: ") {
      // exact split: shares sum to 10^6, k matches the touch count
      rows.map(_._4).sum shouldBe 1000000L
      all(rows.map(_._3)) shouldBe rows.length.toLong
      // shares differ by at most 1 and the +1s are a prefix in time
      val shares = rows.map(_._4)
      (shares.max - shares.min) should be <= 1L
    }
    // the remainder branch is non-vacuous: some purchase has k not
    // dividing 10^6 (k=3 gives 333334/333333/333333, etc.)
    got.groupBy(_._1).values.count(r => 1000000L % r.length != 0) should be > 0
    // earliest-touch bonus: recompute the winners from event order
    val evs = graft.Tables.events(spark, sf01)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
        $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val views = evs.filter(_._4 == "view")
    val purchases = evs.filter(_._4 == "purchase")
    val win = 720L * 60 * 1000000
    for ((pid, pu, pus, _) <- purchases.take(50)) {
      val touches = views.filter(v => v._2 == pu && v._3 <= pus &&
        v._3 >= pus - win).sortBy(v => (v._3, v._1))
      val mine = got.filter(_._1 == pid).sortBy(_._2)
      withClue(s"purchase $pid: ") {
        mine.map(_._2).toSet shouldBe touches.map(_._1).toSet
        if (touches.nonEmpty) {
          val k = touches.length
          val r = (1000000L % k).toInt
          val bonus = touches.take(r).map(_._1).toSet
          for ((_, vid, _, share) <- mine)
            share shouldBe 1000000L / k + (if (bonus(vid)) 1L else 0L)
        }
      }
    }
  }

  test("q59: top session paths match a sequential sessionize-and-count " +
      "replay") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gap = 30L * 60 * 1000000
    val paths = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      // q27's definition: sessions break on ts gaps in EVENT-ID order
      val out = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      var lastTs = Long.MinValue
      for ((_, _, t, us) <- ordered) {
        if (cur.isEmpty || us - lastTs > gap) {
          if (cur.nonEmpty) out += cur.reverse
          cur = List(t)
        } else cur = t :: cur
        lastTs = us
      }
      if (cur.nonEmpty) out += cur.reverse
      out
    }
    val counts = paths.map(_.mkString(">")).groupBy(identity)
      .map { case (p, o) => p -> o.size.toLong }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
      .zipWithIndex.map { case ((p, n), i) => (i + 1, p, n) }
    val got = Relational.sessionPaths(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    got shouldBe expect
    // paths are genuinely multi-event: some top path has a '>'
    got.map(_._2).count(_.contains(">")) should be > 0
  }

  test("q56: KS distances match a sequential two-sample recompute with ties") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sf)
      .select($"event_type", round($"value" * 100, 0).cast("bigint").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = evs.groupBy(_._1).map { case (t, r) => t -> r.map(_._2).sorted }
    def ks(a: Seq[Long], b: Seq[Long]): Long = {
      // evaluate |cntA*nB - cntB*nA| at every distinct value of either
      val xs = (a ++ b).distinct.sorted
      xs.map { x =>
        val ca = a.count(_ <= x).toLong
        val cb = b.count(_ <= x).toLong
        math.abs(ca * b.length - cb * a.length)
      }.max
    }
    val types = byType.keys.toSeq.sorted
    val expect = (for {
      i <- types.indices; j <- (i + 1) until types.length
      (ta, tb) = (types(i), types(j))
      (a, b) = (byType(ta), byType(tb))
    } yield (ta, tb, a.length.toLong, b.length.toLong, ks(a, b),
      ks(a, b) * 1000000L / (a.length.toLong * b.length))).toSeq
    val got = Relational.ksDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe expect
    // non-degenerate: distributions differ somewhere (ks > 0) but the
    // statistic stays a genuine fraction of n_a*n_b
    got.map(_._5).max should be > 0L
    all(got.map(_._6)) should be < 1000000L
  }

  test("intervalIslands: sequential merge replay, island laws") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val rows = Relational.intervalIslands(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    rows should not be empty
    // independent sequential replay per user
    val durs = Map("view" -> 5L, "click" -> 10L, "purchase" -> 30L,
      "signup" -> 15L).withDefaultValue(1L)
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(2) + durs(r.getString(3)) * 60000000L))
    val exp = evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      var islands = List.empty[(Long, Long, Long)] // start, end, n
      sorted.foreach { case (_, _, s, e) =>
        islands match {
          case (st, en, n) :: rest if s <= en =>
            islands = (st, math.max(en, e), n + 1) :: rest
          case _ => islands = (s, e, 1L) :: islands
        }
      }
      islands.reverse.zipWithIndex.map { case ((st, en, n), i) =>
        (u, i + 1L, st, en, n, en - st)
      }
    }.toSet
    rows.toSet shouldBe exp
    // laws: islands per user are disjoint, ordered, and both branches
    // of the cut genuinely occur on this corpus
    rows.groupBy(_._1).foreach { case (_, is) =>
      is.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => b._3 should be > a._4 // next start after end
        case _ =>
      }
    }
    rows.exists(_._5 > 1) shouldBe true
    rows.exists(_._5 == 1) shouldBe true
  }

  test("q61: deciles and Gini match a sequential recompute; Lorenz laws " +
      "hold (monotone, convex-ish, ends at exactly 1e6)") {
    val rows = Relational.lorenzGini(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    graft.Caches.releaseAll(spark)
    // sequential recompute from raw events on the same cents grid
    val spend = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sorted = spend.toSeq.sortBy { case (u, c) => (c, u) }
    val n = sorted.length.toLong
    val s0 = sorted.map(_._2).sum
    val s1 = sorted.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
    val gini = (2 * s1 - (n + 1) * s0) * 1000000L / (n * s0)
    val exp = sorted.zipWithIndex
      .map { case ((_, c), i) => (((i.toLong * 10) / n).toInt + 1, i + 1L, c) }
      .groupBy(_._1).toSeq.map { case (d, xs) =>
        val rmax = xs.map(_._2).max
        val cum = sorted.take(rmax.toInt).map(_._2).sum
        (d, xs.length.toLong, xs.map(_._3).sum,
          rmax * 1000000L / n, cum * 1000000L / s0, gini)
      }.toSet
    rows.toSet shouldBe exp
    // Lorenz laws: cum ppm strictly increases with decile, closes at
    // exactly 1e6 (all users, all spend), and the curve sits below the
    // diagonal (spend is concentrated, so cum_spend <= cum_users)
    val byDec = rows.sortBy(_._1)
    byDec.map(_._4).toSeq shouldBe byDec.map(_._4).toSeq.sorted
    byDec.map(_._5).toSeq shouldBe byDec.map(_._5).toSeq.sorted
    byDec.last._4 shouldBe 1000000L
    byDec.last._5 shouldBe 1000000L
    byDec.foreach { r => r._5 should be <= r._4 }
    // Gini is a genuine inequality signal on this corpus: strictly
    // inside (0, 1e6)
    val g = rows.head._6
    g should (be > 0L and be < 1000000L)
    // tie-order irrelevance: recomputing S1 with equal-cents users in
    // REVERSED tie order leaves the Gini unchanged
    val sortedRev = spend.toSeq.sortBy { case (u, c) => (c, -u) }
    val s1r = sortedRev.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
    s1r shouldBe s1
  }

  test("benfordAudit: exact sequential recompute, constant-table laws") {
    val rows = Relational.benfordAudit(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    graft.Caches.releaseAll(spark)
    rows.keySet shouldBe (1 to 9).toSet
    // the constant table is floor ppm of log10(1+1/d)
    Relational.BenfordPpm.foreach { case (d, p) =>
      p shouldBe math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong
    }
    Relational.BenfordPpm.map(_._2).sum shouldBe 999995L
    // sequential recompute from raw orders
    val cents = graft.Tables.orders(spark, sf)
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100)).filter(_ >= 1)
    val n = cents.length.toLong
    val obs = cents.map(_.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var chiTot = 0L
    val terms = Relational.BenfordPpm.map { case (d, e) =>
      val o = obs.getOrElse(d, 0L)
      val dev = o * 1000000L - n * e
      val chi = (BigInt(dev) * dev / (BigInt(n) * e)).toLong
      chiTot += chi
      d -> (o, o * 1000000L / n, e, dev, chi)
    }.toMap
    terms.foreach { case (d, (o, oPpm, e, dev, chi)) =>
      rows(d) shouldBe ((o, oPpm, e, dev, chi, chiTot))
    }
    // the deviations carry both signs or the audit is vacuous, and the
    // exact common-denominator identity holds: Σ dev = n·(10⁶ − Σ exp)
    val devSum = terms.values.map(_._4).sum
    devSum shouldBe n * (1000000L - 999995L)
  }

  test("corrAudit: exact sequential recompute, sign/bounds/constant laws") {
    val rows = Relational.corrAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    graft.Caches.releaseAll(spark)
    rows.keySet shouldBe Set("cents_vs_events", "cents_vs_errors",
      "events_vs_errors")
    // sequential recompute from raw events
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("value"), col("event_type")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100),
        if (r.getString(2) == "error") 1L else 0L))
    val m = ev.groupBy(_._1).values.map { es =>
      (es.map(_._2).sum, es.length.toLong, es.map(_._3).sum)
    }.toSeq
    val n = BigInt(m.length)
    def moments(f: ((Long, Long, Long)) => Long, g: ((Long, Long, Long)) => Long) = {
      val sa = m.map(t => BigInt(f(t))).sum
      val sb = m.map(t => BigInt(g(t))).sum
      val sab = m.map(t => BigInt(f(t)) * g(t)).sum
      val saa = m.map(t => BigInt(f(t)) * f(t)).sum
      val sbb = m.map(t => BigInt(g(t)) * g(t)).sum
      val num = n * sab - sa * sb
      val dx = n * saa - sa * sa
      val dy = n * sbb - sb * sb
      val r2 = if (dx == 0 || dy == 0) None
        else Some((num * num / dx * 1000000 / dy).toLong)
      (num.signum, r2)
    }
    val exp = Map(
      "cents_vs_events" -> moments(_._1, _._2),
      "cents_vs_errors" -> moments(_._1, _._3),
      "events_vs_errors" -> moments(_._2, _._3))
    exp.foreach { case (p, (sg, r2)) =>
      rows(p) shouldBe ((m.length.toLong, sg, r2))
      r2.foreach(v => v should (be >= 0L and be <= 1000000L))
    }
    // the audit is non-vacuous: spend and event count genuinely
    // correlate positively (spend is a sum over events)
    rows("cents_vs_events")._2 shouldBe 1
    rows("cents_vs_events")._3.get should be > 100000L
  }

  test("theilL: exact sequential recompute, GE(0) vs GE(1) sensitivity") {
    import graft.functions.IntLog
    val rows = Relational.theilL(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.Caches.releaseAll(spark)
    rows.size should be > 2
    val spend = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 >= 1)
    val segOf = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySeg = spend.toSeq.groupBy { case (ck, _) => segOf(ck) }
    val (n, s) = (spend.size.toLong, spend.values.sum)
    var btwExp = 0L
    for ((sg, xs) <- bySeg) {
      val nG = xs.length.toLong
      val sG = xs.map(_._2).sum
      val num = xs.map { case (_, x) =>
        IntLog.log2FixedRef(sG) - IntLog.log2FixedRef(x * nG)
      }.sum
      val ppm = BigInt(num).abs * 1000000 / (BigInt(nG) * (1L << IntLog.F)) *
        (if (num >= 0) 1 else -1)
      rows(sg) shouldBe ((nG, sG, num, ppm.toLong))
      btwExp += nG * (IntLog.log2FixedRef(s * nG) - IntLog.log2FixedRef(sG * n))
    }
    val (bn, bs, bnum, _) = rows("(between)")
    (bn, bs, bnum) shouldBe ((n, s, btwExp))
    // GE(0) is non-negative in exact real arithmetic per segment
    // (Jensen); the fixed-point numerator can undershoot by at most
    // one grid ulp per customer
    bySeg.foreach { case (sg, xs) =>
      rows(sg)._3 should be >= -xs.length.toLong
    }
    // the decomposition tracks the true real value: total L over all
    // customers ≈ between-bits + Σ (n_g/n)·L_g
    def bits(num: Long, den: Long): Double =
      num.toDouble / den / (1L << IntLog.F)
    val lTot = spend.values.map { x =>
      math.log(s.toDouble / n / x) / math.log(2) / n
    }.sum
    val lDecomp = bits(btwExp, n) + bySeg.map { case (sg, xs) =>
      xs.length.toDouble / n * bits(rows(sg)._3, xs.length.toLong)
    }.sum
    lDecomp shouldBe lTot +- 0.01
  }

  test("ewmaSmooth: exact sequential recompute, smoother laws") {
    val rows = Relational.ewmaSmooth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    rows should not be empty
    // the weight table is exactly 16384·(3/4)^k — no flooring anywhere
    Relational.EwmaW.zipWithIndex.foreach { case (w, k) =>
      BigDecimal(w) shouldBe BigDecimal(16384) * BigDecimal(3).pow(k) /
        BigDecimal(4).pow(k)
    }
    // sequential recompute from raw events
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        math.round(r.getDouble(3) * 100)))
    for ((_, es) <- ev.groupBy(_._1)) {
      val ordered = es.sortBy(e => (e._3, e._2)).map(e => (e._2, e._4))
      ordered.indices.foreach { i =>
        val lags = Relational.EwmaW.zipWithIndex.flatMap { case (w, k) =>
          if (i - k >= 0) Some((w, ordered(i - k)._2)) else None
        }
        val ewma = lags.map { case (w, c) => w * c }.sum /
          lags.map(_._1).sum
        val (cents, got) = rows((es.head._1, ordered(i)._1))
        cents shouldBe ordered(i)._2
        got shouldBe ewma
        // the smoother stays inside the hull of its inputs
        got should be >= lags.map(_._2).min - 1
        got should be <= lags.map(_._2).max
        // a user's first event smooths to itself exactly
        if (i == 0) got shouldBe cents
      }
    }
  }

  test("benford2Audit: exact sequential recompute, constant-table laws") {
    val rows = Relational.benford2Audit(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    graft.Caches.releaseAll(spark)
    rows.keySet shouldBe (0 to 9).toSet
    // the constant table is floor ppm of Σ_k log10(1+1/(10k+d)), and
    // the second-digit law is much FLATTER than the first-digit one
    Relational.Benford2Ppm.foreach { case (d, p) =>
      val exact = (1 to 9).map(k => math.log10(1.0 + 1.0 / (10 * k + d))).sum
      p shouldBe math.floor(exact * 1e6).toLong
    }
    Relational.Benford2Ppm.map(_._2).sum shouldBe 999996L
    val spread2 = Relational.Benford2Ppm.map(_._2)
    val spread1 = Relational.BenfordPpm.map(_._2)
    (spread2.max - spread2.min) should be < (spread1.max - spread1.min) / 5
    // sequential recompute from raw orders
    val cents = graft.Tables.orders(spark, sf)
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100)).filter(_ >= 10)
    val n = cents.length.toLong
    val obs = cents.map(_.toString.charAt(1).asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var chiTot = 0L
    val terms = Relational.Benford2Ppm.map { case (d, e) =>
      val o = obs.getOrElse(d, 0L)
      val dev = o * 1000000L - n * e
      val chi = (BigInt(dev) * dev / (BigInt(n) * e)).toLong
      chiTot += chi
      d -> (o, o * 1000000L / n, e, dev, chi)
    }.toMap
    terms.foreach { case (d, (o, oPpm, e, dev, chi)) =>
      rows(d) shouldBe ((o, oPpm, e, dev, chi, chiTot))
    }
    terms.values.map(_._4).sum shouldBe n * (1000000L - 999996L)
  }

  test("theilIndex: exact sequential recompute, decomposition laws") {
    import graft.functions.IntLog
    val rows = Relational.theilIndex(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    graft.Caches.releaseAll(spark)
    rows.size should be > 2 // segments + the between row
    // sequential recompute from raw orders on the same cents grid
    val spend = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 >= 1)
    val segOf = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySeg = spend.toSeq.groupBy { case (ck, _) => segOf(ck) }
    val (n, s) = (spend.size.toLong, spend.values.sum)
    var btwExp = 0L
    for ((sg, xs) <- bySeg) {
      val nG = xs.length.toLong
      val sG = xs.map(_._2).sum
      val num = xs.map { case (_, x) =>
        x * (IntLog.log2FixedRef(x * nG) - IntLog.log2FixedRef(sG))
      }.sum
      val ppm = BigInt(num).abs * 1000000 / (BigInt(sG) * (1L << IntLog.F)) *
        (if (num >= 0) 1 else -1)
      rows(sg) shouldBe ((nG, sG, num, ppm.toLong))
      // within-segment Theil is non-negative in exact real arithmetic;
      // the fixed-point numerator can undershoot by at most the summed
      // truncation (< 1 log2fixed ulp per customer, scaled by x)
      num should be >= -xs.map(_._2).sum
      btwExp += sG * (IntLog.log2FixedRef(sG * n) - IntLog.log2FixedRef(s * nG))
    }
    val (bn, bs, bnum, _) = rows("(between)")
    (bn, bs, bnum) shouldBe ((n, s, btwExp))
    // decomposition sanity in real arithmetic: total Theil over all
    // customers ≈ between + Σ (S_g/S)·T_g (bits)
    def bits(num: Long, den: Long): Double =
      num.toDouble / den / (1L << IntLog.F)
    val tTot = spend.values.map { x =>
      x.toDouble / s * math.log(x.toDouble * n / s) / math.log(2)
    }.sum
    val tDecomp = bits(btwExp, s) + bySeg.map { case (sg, xs) =>
      val sG = xs.map(_._2).sum
      sG.toDouble / s * bits(rows(sg)._3, sG)
    }.sum
    tDecomp shouldBe tTot +- 0.01
  }
}
