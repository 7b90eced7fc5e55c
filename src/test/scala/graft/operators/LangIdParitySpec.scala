package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The map-only lang-ID forms (native score expressions + array argmax)
  * must reproduce the exploded reference forms — which define oracle
  * parity — row for row on the real corpus.
  */
class LangIdParitySpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("langId (map-only) == exploded reference form") {
    rows(TextAnalysis.langId(spark, sf)) shouldBe
      rows(TextAnalysis.langIdExploded(spark, sf))
  }

  test("langIdCharNgram (map-only) == exploded reference form") {
    rows(TextAnalysis.langIdCharNgram(spark, sf)) shouldBe
      rows(TextAnalysis.langIdCharNgramExploded(spark, sf))
  }

  test("map-only plans contain no shuffle before the final sort") {
    for (df <- Seq(TextAnalysis.langId(spark, sf),
        TextAnalysis.langIdCharNgram(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      // exactly one exchange: the rangepartitioning for the ORDER BY
      plan.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
      plan should include("rangepartitioning")
    }
  }
}
