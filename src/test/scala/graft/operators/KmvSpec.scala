package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** q37 KMV sketch invariants beyond its oracle gate. */
class KmvSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("bounded min-k aggregate equals the direct single-window min-k") {
    import spark.implicits._
    // recompute the kth hash the naive way (one window per lang) and
    // compare to the operator's map-side-combinable aggregate
    val h = Tables.documents(spark, sf)
      .select($"lang", md5($"text".cast("binary")).as("h")).distinct()
    val direct = h
      .withColumn("rn", row_number().over(Window.partitionBy($"lang").orderBy($"h")))
      .filter($"rn" <= 32)
      .groupBy($"lang").agg(count(lit(1)).as("n_keys"), max($"h").as("kth_hash"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    val got = Relational.kmvDistinct(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(r.fieldIndex("n_keys")), r.getString(r.fieldIndex("kth_hash")))).toMap
    got shouldBe direct
  }

  test("aggregate runs with map-side partial aggregation (no corpus-wide partition)") {
    val plan = Relational.kmvDistinct(spark, sf).queryExecution.executedPlan.toString
    // Aggregator-backed udaf must plan as partial + final HashAggregate /
    // ObjectHashAggregate pairs, never a single-stage sort over the corpus
    (plan should include).regex("(?i)(ObjectHashAggregate|SortAggregate|HashAggregate)")
    (plan should not).include("Window")
  }

  test("planted sub-k corpus: estimate is exactly the distinct count") {
    import spark.implicits._
    // 5 distinct texts (one duplicated) in one lang — forces the
    // n_keys < k branch of the estimator deterministically instead of
    // relying on sf0.01 corpus composition
    val docs = Seq(
      ("xx", "alpha"), ("xx", "beta"), ("xx", "gamma"),
      ("xx", "delta"), ("xx", "epsilon"), ("xx", "alpha")
    ).toDF("lang", "text")
    val row = Relational.kmvDistinctOn(docs).collect().head
    row.getLong(row.fieldIndex("n_exact")) shouldBe 5L
    row.getLong(row.fieldIndex("n_keys")) shouldBe 5L
    row.getDouble(row.fieldIndex("est")) shouldBe 5.0
  }

  test("merge/reduce invariants: duplicate-skipping, bounded, order-free") {
    val agg = new graft.functions.MinKAggregator(4)
    val fold = Seq("c", "a", "e", "a", "b", "d", "f")
      .foldLeft(agg.zero)(agg.reduce)
    fold.toSeq shouldBe Seq("a", "b", "c", "d")
    // merge of disjoint partials == reduce over the union
    val left = Seq("e", "b", "f").foldLeft(agg.zero)(agg.reduce)
    val right = Seq("a", "c", "b").foldLeft(agg.zero)(agg.reduce)
    agg.merge(left, right).toSeq shouldBe Seq("a", "b", "c", "e")
    agg.merge(right, left).toSeq shouldBe Seq("a", "b", "c", "e")
    agg.merge(agg.zero, left).toSeq shouldBe left.toSeq
    agg.merge(left, agg.zero).toSeq shouldBe left.toSeq
  }

  test("estimate is exact below k and within 2x of truth above it") {
    val rows = Relational.kmvDistinct(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val (nExact, nKeys, est) = (r.getLong(1), r.getLong(2),
        r.getDouble(r.fieldIndex("est")))
      if (nKeys < 32) est shouldBe nExact.toDouble
      else {
        // k=32 KMV standard error ~ 1/sqrt(k-2) ~ 18%; 2x is a loose
        // sanity band that a broken estimator cannot pass
        est should be >= nExact / 2.0
        est should be <= nExact * 2.0
      }
    }
  }

  test("countMinSketch: row mass, overestimate bound, cell-wise mergeability") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sk = TextAnalysis.countMinSketch(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val truth = docs
      .select(explode(graft.functions.Text.toks(col("text"))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = truth.map(_._2).sum
    // mass conservation: every depth row distributes the full corpus
    for (d <- 0 until 4)
      sk.collect { case ((dd, _), c) if dd == d => c }.sum shouldBe total
    // the count-min contract: every row's cell >= the true count, so
    // the min-over-rows point estimate can only OVER-estimate —
    // checked for EVERY vocabulary token against an independent JVM
    // md5 placement (also re-proving the hash convention end-to-end)
    def h(d: Int, tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cm$d:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 8), 16) % 256).toInt
    }
    truth.foreach { case (tok, c) =>
      val est = (0 until 4).map(d => sk((d, h(d, tok)))).min
      withClue(s"token $tok: ") { est should be >= c }
    }
    // mergeability — the reason a 100 TB pipeline ships sketches:
    // sketch(even docs) + sketch(odd docs) == sketch(all), cell-wise
    def skOf(f: org.apache.spark.sql.DataFrame) =
      TextAnalysis.countMinSketch(f).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val a = skOf(docs.filter(col("doc_id") % 2 === 0))
    val b = skOf(docs.filter(col("doc_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    merged shouldBe sk
  }

  test("heavyHitters: estimates equal the independent min-cell recompute, est >= freq") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    val out = TextAnalysis.heavyHittersGate(spark, sfDir).collect()
    graft.Caches.releaseAll(spark)
    out.length shouldBe 20
    // ranks contiguous and ordered by (est DESC, gram)
    out.map(_.getInt(0)).toSeq shouldBe (1 to 20)
    out.sliding(2).foreach { case Array(x, y) =>
      val ord = x.getLong(3) > y.getLong(3) ||
        (x.getLong(3) == y.getLong(3) && x.getString(1) < y.getString(1))
      withClue(s"${x.getString(1)} before ${y.getString(1)}: ") { ord shouldBe true }
    }
    // independent ground truth + JVM md5 sketch placement (the same
    // helper discipline as the t25 spec above): the point estimate
    // each candidate gets must EQUAL min over rows of its cell, and
    // the count-min contract makes it >= the true count
    val truth = docs
      .select(explode(graft.functions.Text.toks(col("text"))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def h(d: Int, tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cm$d:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 8), 16) % 256).toInt
    }
    val cells = scala.collection.mutable.Map.empty[(Int, Int), Long]
    truth.foreach { case (tok, c) =>
      for (d <- 0 until 4) {
        val k = (d, h(d, tok))
        cells(k) = cells.getOrElse(k, 0L) + c
      }
    }
    out.foreach { r =>
      val (gram, freq, est) = (r.getString(1), r.getLong(2), r.getLong(3))
      withClue(s"candidate $gram: ") {
        freq shouldBe truth(gram)
        est shouldBe (0 until 4).map(d => cells((d, h(d, gram)))).min
        est should be >= freq
      }
    }
    // the candidate set is exactly t07's top-20 unigrams
    val t07 = TextAnalysis.topNgrams(spark, sfDir).collect()
      .filter(_.getInt(0) == 1).map(_.getString(2)).toSet
    graft.Caches.releaseAll(spark)
    out.map(_.getString(1)).toSet shouldBe t07
  }

  test("q38 HLL: merge law — cell-wise max of half-corpus sketches = whole sketch") {
    import spark.implicits._
    // the property that makes HLL the partitioned/streaming standard:
    // registers from two disjoint halves, max-merged per cell, are
    // BIT-IDENTICAL to the registers built over the union — so the
    // map-side partial aggregation Spark runs IS the full computation
    val docs = Tables.documents(spark, sf)
    def regsOf(df: org.apache.spark.sql.DataFrame): Map[(String, Int), Int] =
      Relational.hllDistinctOn(df).collect().flatMap { r =>
        r.getString(r.fieldIndex("registers")).split(",").zipWithIndex
          .map { case (v, j) => (r.getString(0), j) -> v.toInt }
      }.toMap
    val whole = regsOf(docs)
    val a = regsOf(docs.filter($"doc_id" % 2 === 0))
    val b = regsOf(docs.filter($"doc_id" % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map { k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))
    }.toMap
    merged shouldBe whole
  }

  test("q38 HLL: estimate within 30% of exact at sf0.01 (m=16 ⇒ σ≈26%)") {
    val rows = Relational.hllDistinct(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("n_exact")).toDouble
      val est = r.getDouble(r.fieldIndex("est"))
      withClue(s"lang ${r.getString(0)}: est=$est exact=$exact: ") {
        math.abs(est - exact) / exact should be < 0.30
      }
    }
  }

  test("q38 HLL: register build is map-combinable (no window, hash aggregate)") {
    val plan = Relational.hllDistinct(spark, sf).queryExecution.executedPlan.toString
    (plan should include).regex("(?i)HashAggregate")
    (plan should not).include("Window")
  }

  test("q39 profile: every branch scans exactly ONE column; stats match a recompute") {
    import spark.implicits._
    val df = Relational.tableProfile(spark, sf)
    // column pruning: each union branch's parquet scan reads only its
    // own field — 8 single-column ReadSchemas, never the full row
    val plan = df.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    schemas should have size 8
    schemas.foreach(s => s.split(",") should have size 1)
    // independent recompute of one numeric and one key column
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    val qty = graft.Tables.lineitem(spark, sf)
      .select(col("l_quantity")).collect().map(_.getDouble(0))
    val q = rows("l_quantity")
    q.getLong(1) shouldBe qty.length.toLong
    q.getLong(2) shouldBe 0L
    q.getLong(3) shouldBe qty.distinct.length.toLong
    q.getLong(4) shouldBe qty.map(v => math.round(v * 100)).min
    q.getLong(5) shouldBe qty.map(v => math.round(v * 100)).max
    q.getLong(6) shouldBe qty.map(v => math.round(v * 100)).sum
  }
}
