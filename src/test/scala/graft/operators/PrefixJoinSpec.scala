package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** d23 prefix-filtered Jaccard join: the whole value of the operator is
  * that candidate generation is LOSSLESS — these specs prove equality
  * with an independent brute-force join (which the DuckDB gate also
  * does cross-engine) and measure that the prefix actually prunes.
  */
class PrefixJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Independent reference: full quadratic shared-shingle join. */
  private def brute(sh: DataFrame, tau: Double): Set[(Long, Long, Long)] = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("ic"))
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"), col("ic"),
        round(col("ic") / (col("sa.n") + col("sb.n") - col("ic")), 6).as("j"))
      .filter(col("j") >= tau)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("lossless vs brute force on the real sf0.1 corpus (planted near-dups)") {
    val sh = Dedup.shingleSet(spark, "/root/testdata/sf0.1", None).cache()
    try {
      val got = Dedup.jaccardPrefixOn(sh, 1, 2, Long.MaxValue).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got should not be empty
      got shouldBe brute(sh, 0.5)
    } finally { sh.unpersist(); graft.Caches.releaseAll(spark) }
  }

  test("boundary pairs exactly AT the threshold are kept (hand corpus)") {
    import spark.implicits._
    // doc 1/2: trigram sets of size 2 sharing 2 → J = 1.0 (exact dup)
    // doc 3/4: sizes 3 and 3 sharing 2 → J = 2/4 = 0.5 (boundary)
    // doc 5/6: sizes 4 and 4 sharing 2 → J = 2/6 < 0.5 (excluded)
    val sh = Seq(
      (1L, "s1"), (1L, "s2"),
      (2L, "s1"), (2L, "s2"),
      (3L, "s1"), (3L, "s3"), (3L, "s4"),
      (4L, "s1"), (4L, "s3"), (4L, "s5"),
      (5L, "s6"), (5L, "s7"), (5L, "s8"), (5L, "s9"),
      (6L, "s6"), (6L, "s7"), (6L, "sa"), (6L, "sb")
    ).toDF("doc_id", "sh")
    val got = Dedup.jaccardPrefixOn(sh, 1, 2, Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
    got shouldBe Set((1L, 2L, 1.0), (3L, 4L, 0.5))
    got shouldBe brute(sh, 0.5).map { case (a, b, _) =>
      (a, b, if (a == 1L) 1.0 else 0.5) }
    graft.Caches.releaseAll(spark)
  }

  test("prefix actually prunes: candidate pairs << quadratic on sf0.1") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.1"
    val sh = Dedup.shingleSet(spark, sf, None).cache()
    try {
      val nDocs = sh.select($"doc_id").distinct().count()
      val allPairs = nDocs * (nDocs - 1) / 2
      // recompute the candidate count the operator's prefix join produces
      val keyed = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        .select($"sh",
          concat(lpad($"df".cast("string"), 12, "0"), lit(" "), $"sh").as("okey"))
      val dict = Ranking.denseIds(keyed, "okey", "sid")
      val docs = sh.join(keyed, "sh").join(dict, "okey")
        .groupBy($"doc_id").agg(sort_array(collect_list($"sid")).as("sids"))
        .withColumn("n", org.apache.spark.sql.functions.size($"sids"))
        .withColumn("p", ($"n" - floor(($"n" + 1) / lit(2.0)) + 1).cast("int"))
      val prefix = docs.select($"doc_id", $"n",
        explode(slice($"sids", lit(1), $"p")).as("sid"))
      val cands = prefix.as("x").join(prefix.as("y"),
          $"x.sid" === $"y.sid" && $"x.doc_id" < $"y.doc_id" &&
            $"x.n" <= $"y.n" * 2 && $"y.n" <= $"x.n" * 2)
        .select($"x.doc_id", $"y.doc_id").distinct().count()
      withClue(s"candidates=$cands allPairs=$allPairs: ") {
        cands.toDouble / allPairs should be < 0.05
      }
    } finally { sh.unpersist(); graft.Caches.releaseAll(spark) }
  }

  test("positional filter: strictly fewer candidates, zero lost pairs (sf0.1)") {
    val sh = Dedup.shingleSet(spark, "/root/testdata/sf0.1", None).cache()
    try {
      val docs = Dedup.sortedSidDocs(sh, 1, 2).cache()
      val without = Dedup.jaccardPrefixCandidates(docs, 1, 2, Long.MaxValue,
        positional = false).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val withPos = Dedup.jaccardPrefixCandidates(docs, 1, 2, Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withPos.size should be < without.size // the cut is real
      withPos.subsetOf(without) shouldBe true
      // zero lost TRUE pairs: every brute-force qualifying pair is a candidate
      val truePairs = brute(sh, 0.5).map { case (a, b, _) => (a, b) }
      truePairs.subsetOf(withPos) shouldBe true
      docs.unpersist()
    } finally { sh.unpersist(); graft.Caches.releaseAll(spark) }
  }

  test("guard fires on a pathological hot prefix shingle, naming the parameter") {
    import spark.implicits._
    // every doc is the same 2-shingle set → the rarest-first order
    // still puts one shingle in every prefix with population = nDocs
    val sh = (1L to 64L).flatMap(d => Seq((d, "hot1"), (d, "hot2")))
      .toDF("doc_id", "sh")
    val ex = intercept[Exception] {
      Dedup.jaccardPrefixOn(sh, 1, 2, maxPrefixPop = 8).collect()
    }
    ex.getMessage should include("tauNum/tauDen")
    graft.Caches.releaseAll(spark)
  }
}
