package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The codegen'd SortedIntersectCount must be bit-identical to
  * `size(array_intersect(a, b))` on sorted input — the equivalence that
  * licenses the d23/d26 verify swap (r14-opt). Asserted on the real
  * sf0.001 sortedSidDocs arrays (the exact frames the verify reads) and
  * on adversarial randomized arrays (duplicates, empties, overlaps at
  * both ends, null elements).
  */
class ArrayExpressionsSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("matches size(array_intersect) on the real d23 verify arrays") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = graft.functions.Text.tokenized(docs, "doc_id", "text")
      .select($"doc_id", explode(Text.shingles($"tk")).as("sh"))
      .distinct()
      .withColumn("sid", abs(xxhash64($"sh")) % lit(2147483647L))
    val sets = sh.groupBy($"doc_id")
      .agg(sort_array(collect_list($"sid")).as("sids"))
    // every doc pair in a bounded slice — includes disjoint, partial
    // and self-identical overlaps
    val s = sets.filter($"doc_id" < 40)
    val bad = s.as("x").join(s.as("y"), $"x.doc_id" <= $"y.doc_id")
      .select(
        ArrayFunctions.sortedIntersectCount($"x.sids", $"y.sids").as("native"),
        org.apache.spark.sql.functions.size(array_intersect($"x.sids", $"y.sids")).cast("bigint").as("builtin"))
      .filter(!($"native" <=> $"builtin"))
    bad.count() shouldBe 0
  }

  test("matches size(array_intersect) on randomized sorted arrays") {
    import spark.implicits._
    // deterministic seed; small value domain forces collisions and
    // duplicate runs; lengths 0..24 cover empty and asymmetric cases
    val rnd = new scala.util.Random(421417L)
    val cases = (1 to 500).map { _ =>
      def arr() = Array.fill(rnd.nextInt(25))(rnd.nextInt(41).toLong - 20L).sorted
      (arr(), arr())
    }
    val df = spark.createDataFrame(cases).toDF("a", "b")
    val bad = df.select(
        ArrayFunctions.sortedIntersectCount($"a", $"b").as("native"),
        org.apache.spark.sql.functions.size(array_intersect($"a", $"b")).cast("bigint").as("builtin"))
      .filter(!($"native" <=> $"builtin"))
    bad.count() shouldBe 0
  }

  test("null input and null elements match the builtin") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq[Option[Long]](None, Some(1L), Some(3L))),
        Some(Seq[Option[Long]](None, Some(3L)))), // null in both: counts once
      (Some(Seq[Option[Long]](None, Some(2L))),
        Some(Seq[Option[Long]](Some(2L), Some(4L)))), // null one side only
      (None, Some(Seq[Option[Long]](Some(1L)))), // null array -> null
      (Some(Seq[Option[Long]]()), Some(Seq[Option[Long]](Some(1L))))
    ).toDF("a", "b")
    val bad = df.select(
        ArrayFunctions.sortedIntersectCount($"a", $"b").as("native"),
        org.apache.spark.sql.functions.size(array_intersect($"a", $"b")).cast("bigint").as("builtin"))
      .filter(!($"native" <=> $"builtin"))
    bad.count() shouldBe 0
  }
}
