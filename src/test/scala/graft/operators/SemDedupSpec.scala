package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** Invariants for the d15 SemDeDup operator beyond its oracle gate. */
class SemDedupSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("semDedup: total partition of the corpus, keep <=> no smaller-id dup") {
    val rows = Dedup.semDedup(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    val n = Tables.embeddings(spark, sf).count()
    rows.length.toLong shouldBe n
    rows.map(_.getLong(0)).distinct.length.toLong shouldBe n
    rows.foreach { r =>
      r.getBoolean(3) shouldBe (r.getLong(2) == 0L)
    }
    // the synthetic corpus has genuine semantic dups at the gate threshold
    rows.count(!_.getBoolean(3)) should be > 0
  }

  test("semDedup: n_dups agrees with an exact interpreted-fold recompute") {
    import spark.implicits._
    // independent path: interpreted dotFold (not the codegen'd vecDot),
    // join built from the cell map the other way around
    val cells = Similarity.assignToCentroids(spark, sf, 8)
      .select($"vec_id", $"cell")
    val v = Tables.embeddings(spark, sf)
      .join(cells, "vec_id")
      .select($"vec_id", $"cell", $"embedding",
        Similarity.norm2Fold($"embedding").as("nrm"))
    val expected = v.as("y").join(v.as("x"),
        $"x.cell" === $"y.cell" && $"x.vec_id" < $"y.vec_id", "left")
      .select($"y.vec_id".as("vec_id"),
        when($"x.vec_id".isNotNull &&
          round(Similarity.dotFold($"x.embedding", $"y.embedding") /
            sqrt($"x.nrm" * $"y.nrm"), 6) >= 0.2, 1L).otherwise(0L).as("hit"))
      .groupBy($"vec_id").agg(sum($"hit").as("exp_dups"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.semDedup(spark, sf).collect().foreach { r =>
      withClue(s"vec ${r.getLong(0)}: ") {
        r.getLong(2) shouldBe expected(r.getLong(0))
      }
    }
    graft.Caches.releaseAll(spark)
  }

  test("mutualKnnCanonicalize equals an independent union-find over mutual edges") {
    val rows = Dedup.mutualKnnCanonicalize(spark, sf).collect()
    graft.Caches.releaseAll(spark)
    // independent reference: the gated s16 edges, kept when BOTH
    // directions exist and the cosine clears the threshold, closed
    // with a min-root union-find (the GraphX CC min-label convention)
    val edges = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    graft.Caches.releaseAll(spark)
    val dir = edges.map(e => (e._1, e._2)).toSet
    val mutual = edges
      .filter(e => e._1 < e._2 && e._3 >= 0.2 && dir.contains((e._2, e._1)))
      .map(e => (e._1, e._2))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    mutual.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val n = Tables.embeddings(spark, sf).count()
    rows.length.toLong shouldBe n // every vector mapped exactly once
    rows.map(_.getLong(0)).distinct.length shouldBe rows.length
    rows.foreach { r =>
      val (id, canon, dup) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      withClue(s"vec $id: ") {
        canon shouldBe find(id)
        dup shouldBe (canon != id)
      }
    }
  }
}
