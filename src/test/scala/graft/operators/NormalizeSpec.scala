package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Per-fold pins for the t36 unicode normalization — each rule is
  * asserted on a hand-built string where ONLY that rule fires, so a
  * regression in one fold names itself; then idempotence and the
  * never-reintroduce-whitespace closure over the gate corpus.
  */
class NormalizeSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def norm(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("x").select(TextAnalysis.normalizeCol(col("x")))
      .collect()(0).getString(0)
  }

  test("each fold fires in isolation") {
    // curly double and single quotes fold to ASCII
    norm("\u201Cab\u201D") shouldBe "\"ab\""
    norm("it\u2019s \u2018q\u2019") shouldBe "it's 'q'"
    // em and en dashes fold to hyphen
    norm("a\u2014b\u2013c") shouldBe "a-b-c"
    // NBSP is a space; runs collapse
    norm("a\u00A0\u00A0b") shouldBe "a b"
    // zero-width space and BOM vanish WITHOUT splitting the word
    norm("a\u200Bb\uFEFFc") shouldBe "abc"
    // C0 controls (bell, VT, tab, CRLF) become single spaces
    norm("a\u0007b\u000Bc\td\r\ne") shouldBe "a b c d e"
    // DEL is in the control class too
    norm("a\u007Fb") shouldBe "a b"
    // trim + lower
    norm("  A  B  ") shouldBe "a b"
  }

  test("idempotent and whitespace-closed over the garbled gate corpus") {
    import spark.implicits._
    val out = TextAnalysis.normalizeText(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"norm").collect()
    out should not be empty
    out.foreach { r =>
      val n = r.getString(1)
      // closure: no residual unicode debris, controls, or runs
      n.exists(c => c < ' ' || c > '~') shouldBe false
      n.contains("  ") shouldBe false
      n shouldBe n.trim
      n shouldBe n.toLowerCase
    }
    // idempotence: a second pass is the identity
    val again = Seq(out.map(_.getString(1)).toSeq).flatten.toDF("x")
      .select(col("x"), TextAnalysis.normalizeCol(col("x")).as("y"))
      .collect()
    again.foreach(r => r.getString(1) shouldBe r.getString(0))
  }

  test("urlDomainStats: decoy skipped, census recomputes, https split") {
    import graft.Tables
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.urlDomainStats(spark, sf).collect()
    rows should not be empty
    val nDocs = Tables.documents(spark, sf)
      .filter("length(text) >= 40").count()
    // three URLs per doc, the ftp decoy contributes nothing
    rows.map(_.getLong(1)).sum shouldBe 3 * nDocs
    rows.map(_.getString(0)) should not contain "skip.me"
    // the hot domain aggregates: one https URL per doc
    val ex = rows.find(_.getString(0) == "example.com").get
    ex.getLong(1) shouldBe nDocs
    ex.getLong(2) shouldBe nDocs
    ex.getLong(3) shouldBe nDocs // all https
    // the www-stripped .org URLs ride plain http
    val orgs = rows.filter(_.getString(0).endsWith(".org"))
    orgs should not be empty
    orgs.foreach(r => r.getLong(3) shouldBe 0L)
    // registered-domain reduction: every domain is exactly two labels
    rows.foreach(_.getString(0).count(_ == '.') shouldBe 1)
  }
}
