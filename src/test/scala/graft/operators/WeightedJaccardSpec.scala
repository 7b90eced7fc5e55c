package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** d33 exact weighted (multiset) Jaccard vs a sequential recompute. */
class WeightedJaccardSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d33: pairs match a sequential multiset recompute, and repetition " +
      "genuinely separates set-identical documents") {
    import org.apache.spark.sql.functions.{col, explode}
    val toks = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < 5120L)
      .select(col("doc_id"), explode(graft.functions.Text.toks(col("text")))
        .as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val counts = toks.groupBy(_._1).map { case (d, ts) =>
      d -> ts.groupBy(_._2).map { case (t, o) => t -> o.size.toLong }
    }
    val ids = counts.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      (ca, cb) = (counts(a), counts(b))
      mn = ca.keySet.intersect(cb.keySet).toSeq
        .map(t => math.min(ca(t), cb(t))).sum
      if mn > 0
      na = ca.values.sum; nb = cb.values.sum
      ppm = mn * 1000000L / (na + nb - mn)
      if ppm >= 500000L
    } yield (a, b, na, nb, mn, ppm)).toSeq
    val got = Dedup.weightedJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got.sorted shouldBe expect.sorted
    got should not be empty
    // the weighted form discriminates where the set form can't:
    // same token SET, different counts -> weighted < 1e6
    def wj(a: Map[String, Long], b: Map[String, Long]): Long = {
      val mn = a.keySet.intersect(b.keySet).toSeq
        .map(t => math.min(a(t), b(t))).sum
      mn * 1000000L / (a.values.sum + b.values.sum - mn)
    }
    val x = Map("buy" -> 50L, "now" -> 50L)
    val y = Map("buy" -> 1L, "now" -> 1L)
    wj(x, y) should be < 100000L // set Jaccard would be exactly 1
    wj(x, x) shouldBe 1000000L
  }

  test("d36: TF-IDF cosine pairs match a sequential recompute; idf " +
      "downweights ubiquitous tokens to zero") {
    import org.apache.spark.sql.functions.{col, explode}
    import graft.functions.IntLog
    val toks = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < 5120L)
      .select(col("doc_id"), explode(graft.functions.Text.toks(col("text")))
        .as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // N counts every sampled doc (also token-empty ones) — the operator
    // contract; here every sampled doc tokenizes non-empty
    val nDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < 5120L).count()
    val tf = toks.groupBy(_._1).map { case (d, ts) =>
      d -> ts.groupBy(_._2).map { case (t, o) => t -> o.size.toLong }
    }
    val dfm = toks.map(t => (t._2, t._1)).distinct.groupBy(_._1)
      .map { case (t, ds) => t -> ds.size.toLong }
    val lnd = IntLog.log2FixedRef(nDocs)
    val w = tf.map { case (d, m) =>
      d -> m.map { case (t, c) => t -> c * (lnd - IntLog.log2FixedRef(dfm(t))) }
        .filter(_._2 >= 1)
    }
    val n2 = w.map { case (d, m) => d -> m.values.map(v => v * v).sum }
    val ids = w.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      dot = w(a).keySet.intersect(w(b).keySet).toSeq
        .map(t => w(a)(t) * w(b)(t)).sum
      if dot > 0
      cos2 = (BigInt(dot) * dot * 1000000 / (BigInt(n2(a)) * n2(b))).toLong
      if cos2 >= 250000L
    } yield (a, b, dot, n2(a), n2(b), cos2)).toSeq
    val got = Dedup.tfidfCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    graft.Caches.releaseAll(spark)
    got.sorted shouldBe expect.sorted
    got should not be empty
    // the idf kill: a token present in EVERY document has
    // log2fixed(N) - log2fixed(df) = 0, so its weight vanishes
    val everywhere = dfm.filter(_._2 == nDocs).keys
    everywhere.foreach { t =>
      w.values.foreach(m => m.get(t) shouldBe None)
    }
    // cosine is scale-invariant where weighted Jaccard is not: a doc
    // and its k-fold repetition have identical tf *direction*
    val wa = Map("alpha" -> 3L, "beta" -> 1L)
    val wb = wa.view.mapValues(_ * 7).toMap
    val dt = wa.keys.map(t => wa(t) * wb(t)).sum
    val c2 = BigInt(dt) * dt * 1000000 /
      (BigInt(wa.values.map(v => v * v).sum) * wb.values.map(v => v * v).sum)
    c2.toLong shouldBe 1000000L +- 1
  }
}
