package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** d24 DBSCAN invariants beyond the oracle gate: the whole clustering
  * is recomputed independently on the driver (brute-force neighbors +
  * union-find) and compared role-for-role, label-for-label.
  */
class DbscanSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("roles and cluster labels match an independent union-find recompute") {
    val rows = Dedup.dbscan(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    rows should not be empty
    // independent reference: brute-force neighbors on collected vectors
    val vecs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dp += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(dp / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ids = vecs.map(_._1)
    val neigh = ids.map(id => id -> scala.collection.mutable.Set[Long]()).toMap
    for (i <- vecs.indices; j <- (i + 1) until vecs.length)
      if (cos(vecs(i)._2, vecs(j)._2) >= 0.3) {
        neigh(vecs(i)._1) += vecs(j)._1; neigh(vecs(j)._1) += vecs(i)._1
      }
    val core = ids.filter(id => neigh(id).size >= 4).toSet
    // union-find over core-core neighbor edges
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- core; b <- neigh(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map { id =>
      val (role, cluster) =
        if (core(id)) ("core", Some(find(id)))
        else {
          val coreNb = neigh(id).filter(core)
          if (coreNb.nonEmpty) ("border", Some(coreNb.map(find).min))
          else ("noise", None)
        }
      id -> ((role, cluster, neigh(id).size.toLong))
    }.toMap
    rows.length shouldBe ids.length
    rows.foreach { r =>
      val id = r.getLong(0)
      val cluster = if (r.isNullAt(2)) None else Some(r.getLong(2))
      withClue(s"vec $id: ") {
        (r.getString(1), cluster, r.getLong(3)) shouldBe expected(id)
      }
    }
    // the fixture really exercises all three roles and multiple clusters
    rows.map(_.getString(1)).distinct.sorted.toSeq shouldBe Seq("border", "core", "noise")
    rows.filter(!_.isNullAt(2)).map(_.getLong(2)).distinct.length should be > 1
  }

  test("deterministic across runs") {
    val a = Dedup.dbscan(spark, sf).collect().map(_.toString).toSeq
    graft.Caches.releaseAll(spark)
    val b = Dedup.dbscan(spark, sf).collect().map(_.toString).toSeq
    graft.Caches.releaseAll(spark)
    a shouldBe b
  }
}
