package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}
import graft.functions.Text

/** Invariants for the t15 boilerplate removal beyond its oracle gate. */
class BoilerplateSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val window = 20

  test("boilerplate: passages partition the token stream; clean docs reassemble exactly") {
    import spark.implicits._
    val got = TextAnalysis.boilerplateRemove(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val toks = Text.tokenized(Tables.documents(spark, sf), "doc_id", "text")
      .select($"doc_id", $"tk").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got.size shouldBe toks.count(_._2.nonEmpty)
    var removedTotal = 0L
    got.foreach { case (id, r) =>
      val tk = toks(id)
      r.getLong(1) shouldBe (tk.size + window - 1) / window // n_passages
      r.getLong(2) should be <= r.getLong(1)
      removedTotal += r.getLong(2)
      if (r.getLong(2) == 0L) r.getString(3) shouldBe tk.mkString(" ")
    }
    // the synthetic corpus carries genuine cross-doc boilerplate
    removedTotal should be > 0L
  }

  test("boilerplate: removal agrees with an independent text-keyed df count") {
    import spark.implicits._
    // recompute df grouping on the passage TEXT (no md5 key) and
    // cross-check per-doc removal counts
    val tkdf = Text.tokenized(Tables.documents(spark, sf), "doc_id", "text")
    val nWin = floor((org.apache.spark.sql.functions.size($"tk") + window - 1)
      / window).cast("int")
    val p = tkdf.select($"doc_id", explode(when(nWin >= 1,
        transform(sequence(lit(0), nWin - 1), i =>
          array_join(slice($"tk", i * window + 1, lit(window)), " ")))
        .otherwise(array().cast("array<string>"))).as("ptext"))
    val expected = p.join(
        p.groupBy($"ptext").agg(count_distinct($"doc_id").as("df")), "ptext")
      .groupBy($"doc_id")
      .agg(sum(when($"df" >= 2, 1L).otherwise(0L)).as("exp_removed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextAnalysis.boilerplateRemove(spark, sf).collect().foreach { r =>
      withClue(s"doc ${r.getLong(0)}: ") {
        r.getLong(2) shouldBe expected(r.getLong(0))
      }
    }
  }
}
