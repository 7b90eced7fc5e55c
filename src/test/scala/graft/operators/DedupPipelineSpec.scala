package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}
import graft.functions.Text

/** End-to-end canonicalization on sf0.1 — the only scale factor whose
  * documents table contains real planted near-duplicates (max trigram
  * Jaccard 0.986; sf0.01 has none).
  */
class DedupPipelineSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.1"

  test("canonicalize finds near-dup clusters and maps them to min ids") {
    val result = Dedup.canonicalize(spark, sf, jaccardThreshold = 0.6).cache()
    val total = result.count()
    total shouldBe Tables.documents(spark, sf).count()

    val dups = result.filter(col("is_duplicate")).collect()
    dups.length should be > 0 // sf0.1 has planted near-dups
    // canonical ids point at a smaller doc_id in the same cluster
    dups.foreach { r =>
      r.getAs[Long]("canonical_id") should be < r.getAs[Long]("doc_id")
    }

    // every duplicate really is near its canonical: verify one pair's
    // trigram Jaccard independently
    val sample = dups.head
    val pair = Seq(sample.getAs[Long]("doc_id"), sample.getAs[Long]("canonical_id"))
    val sh = Text.tokenized(
        Tables.documents(spark, sf).filter(col("doc_id").isin(pair: _*)),
        "doc_id", "text")
      .select(col("doc_id"), explode(Text.shingles(col("tk"))).as("sh"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    // exact-dup chains can make a transitive link; just require overlap
    val Seq(x, y) = pair.map(sh.getOrElse(_, Set.empty[String]))
    val j = x.intersect(y).size.toDouble / math.max(1, x.union(y).size)
    j should be > 0.0

    // non-duplicates are their own canonical
    result.filter(!col("is_duplicate"))
      .filter(col("doc_id") =!= col("canonical_id")).count() shouldBe 0
    result.unpersist()
    graft.Caches.releaseAll(spark)
  }

  test("canonicalizeBest keeps the max-quality member of every cluster") {
    val best = Dedup.canonicalizeBest(spark, sf).cache()
    val quality = TextAnalysis.textStats(spark, sf)
      .select(col("doc_id"), col("quality")).cache()

    // exactly one keeper per cluster, and it is a member of the cluster
    val perCluster = best.groupBy("canonical_id")
      .agg(countDistinct("keep_id").as("nk"),
        sum(when(col("keep"), 1).otherwise(0)).as("nkeep"))
    perCluster.filter(col("nk") =!= 1).count() shouldBe 0
    best.filter(col("keep") && col("doc_id") =!= col("keep_id")).count() shouldBe 0

    // keeper quality is the cluster max (doc_id tiebreak on equal quality)
    val withQ = best.join(quality, "doc_id")
    val viol = withQ.as("m")
      .join(withQ.filter(col("keep")).as("k"), "canonical_id")
      .filter(col("m.quality") > col("k.quality"))
    viol.count() shouldBe 0

    best.unpersist(); quality.unpersist()
    graft.Caches.releaseAll(spark)
  }
}
