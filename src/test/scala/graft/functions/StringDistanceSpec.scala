package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** lev_within — the banded threshold Levenshtein kernel (d25/d27's
  * verify step): agreement with the full DP wherever the verdict is
  * ≤ t, the t+1 sentinel above it, and plan-level codegen evidence.
  */
class StringDistanceSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def full(a: String, b: String): Int = {
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

  private def within(a: String, b: String, t: Int): Int =
    LevenshteinWithinImpl.compute(
      UTF8String.fromString(a), UTF8String.fromString(b), t)

  test("kernel: equals full DP below the threshold, sentinel above, " +
      "for random string pairs at every t") {
    val r = new scala.util.Random(7)
    def rand(n: Int): String =
      (0 until n).map(_ => ('a' + r.nextInt(4)).toChar).mkString
    for (_ <- 1 to 2000) {
      val a = rand(r.nextInt(12))
      val b =
        if (r.nextBoolean()) rand(r.nextInt(12))
        else { // near-dup of a: a few random edits (the join's hot case)
          val sb = new StringBuilder(a)
          for (_ <- 0 until r.nextInt(3) if sb.nonEmpty)
            sb.setCharAt(r.nextInt(sb.length), ('a' + r.nextInt(4)).toChar)
          sb.toString
        }
      val d = full(a, b)
      for (t <- 0 to 5) {
        val got = within(a, b, t)
        withClue(s"'$a' vs '$b' t=$t (true d=$d): ") {
          if (d <= t) got shouldBe d else got shouldBe t + 1
        }
      }
    }
  }

  test("kernel: edges — empties, identical, length-gap short-circuit") {
    within("", "", 2) shouldBe 0
    within("", "abc", 2) shouldBe 3 // n min (t+1)
    within("", "ab", 2) shouldBe 2
    within("same", "same", 0) shouldBe 0
    within("abcdefgh", "abc", 2) shouldBe 3 // gap 5 > t → sentinel
    within("ab", "ba", 1) shouldBe 2 // true distance 2 > t=1 → sentinel
    within("ab", "ba", 2) shouldBe 2
  }

  test("expression: column API agrees with levenshtein() on the corpus " +
      "and stays inside whole-stage codegen") {
    import spark.implicits._
    val names = graft.Tables.part(spark, "/root/testdata/sf0.001")
      .select($"p_name").distinct()
    val both = names.as("a").crossJoin(names.as("b"))
      .select($"a.p_name".as("x"), $"b.p_name".as("y"),
        levenshtein($"x", $"y").as("ref"),
        StringDistance.levWithin($"x", $"y", 2).as("got"))
    both.collect().foreach { r =>
      val (ref, got) = (r.getInt(2), r.getInt(3))
      if (ref <= 2) got shouldBe ref else got shouldBe 3
    }
    // the expression must not break the codegen span: the projection
    // carrying lev_within renders with the `*(n)` whole-stage-codegen
    // marker (AQE's plan string spells stages that way)
    val plan = both.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("lev_within")).get
    projLine should include ("*(")
  }
}
