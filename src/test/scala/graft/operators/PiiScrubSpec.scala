package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Invariants for the t14 PII scrub beyond its oracle gate. */
class PiiScrubSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("piiScrub: every planted pattern is found, redacted, and the scrub is idempotent") {
    val rows = TextAnalysis.piiScrub(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      // the enrichment plants exactly one of each per document
      withClue(s"doc ${r.getLong(0)}: ") {
        r.getInt(1) shouldBe 1 // n_email
        r.getInt(2) shouldBe 1 // n_ip
        r.getInt(3) shouldBe 1 // n_phone
        val clean = r.getString(4)
        // nothing PII-shaped survives the scrub
        TextAnalysis.PiiEmail.r.findFirstIn(clean) shouldBe None
        TextAnalysis.PiiIp.r.findFirstIn(clean) shouldBe None
        TextAnalysis.PiiPhone.r.findFirstIn(clean) shouldBe None
        clean should include("<EMAIL>")
        clean should include("<IP>")
        clean should include("<PHONE>")
      }
    }
  }

  test("piiScrub: a second pass over the cleaned text is a no-op") {
    import spark.implicits._
    val once = TextAnalysis.piiScrub(spark, sf)
      .select($"doc_id", $"clean".as("c0"))
    val twice = once.select(
      col("c0") +: TextAnalysis.piiScrubText($"doc_id", $"c0"): _*)
    twice.filter($"n_email" > 0 || $"n_ip" > 0 || $"n_phone" > 0)
      .count() shouldBe 0L
    twice.filter($"clean" =!= $"c0").count() shouldBe 0L
  }

  test("piiScrub plan: map-only, one exchange for the final sort") {
    val p = TextAnalysis.piiScrub(spark, sf)
      .queryExecution.executedPlan.toString
    p.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
    p should include("rangepartitioning")
  }
}
