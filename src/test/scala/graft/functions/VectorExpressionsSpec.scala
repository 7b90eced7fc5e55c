package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

class VectorExpressionsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)

  test("native vec_dot is bit-identical to the interpreted fold") {
    val both = emb.as("x").crossJoin(emb.as("y"))
      .limit(500)
      .select(
        Similarity.dot(col("x.embedding"), col("y.embedding")).as("native"),
        Similarity.dotFold(col("x.embedding"), col("y.embedding")).as("fold"))
      .collect()
    both.length should be > 0
    both.foreach { r =>
      // exact double equality — same left-to-right accumulation order
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("native norm2 equals dot(v, v) and the fold form") {
    val rows = emb.select(
      Similarity.norm2(col("embedding")).as("native"),
      Similarity.norm2Fold(col("embedding")).as("fold")).collect()
    rows.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("vec_dot registers as a SQL function") {
    VectorFunctions.register(spark)
    emb.createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS n FROM emb_v LIMIT 5").collect()
    r.length shouldBe 5
    r.foreach(_.getDouble(0) should be >= 0.0)
  }

  test("type check rejects non-float-array inputs") {
    val bad = spark.range(1).selectExpr("array(1, 2, 3) AS a")
    an[AnalysisException] should be thrownBy
      bad.select(VectorFunctions.vecDot(col("a"), col("a"))).collect()
  }

  test("whole-stage codegen covers the dot product (no fallback)") {
    val plan = emb.select(Similarity.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen span containing the project
    plan should include regex """\*\(\d+\) Project \[vec_dot"""
  }

  test("dist2q is bit-identical to the interpreted zip_with fold") {
    // grid-quantized integer arrays, the Lloyd inner-loop shape —
    // including the interpreted-eval path (dist2q inside a transform
    // lambda, exactly how the quantizers call it)
    val q = emb.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT))"
    ).as("xqs"))
    val both = q.as("x").crossJoin(q.as("y")).limit(500)
      .select(
        VectorFunctions.dist2q(col("x.xqs"), col("y.xqs")).as("native"),
        expr("aggregate(zip_with(x.xqs, y.xqs, (a, b) -> (a - b) * (a - b)), " +
          "CAST(0 AS BIGINT), (acc, d) -> acc + d)").as("fold"))
      .collect()
    both.length should be > 0
    both.foreach(r => r.getLong(0) shouldBe r.getLong(1))
    // interpreted path: dist2q applied through a transform lambda
    val viaLambda = q.as("x").crossJoin(q.limit(3).as("y")).limit(50)
      .select(transform(array(col("y.xqs")),
        c => VectorFunctions.dist2q(col("x.xqs"), c)).getItem(0).as("native"),
        expr("aggregate(zip_with(x.xqs, y.xqs, (a, b) -> (a - b) * (a - b)), " +
          "CAST(0 AS BIGINT), (acc, d) -> acc + d)").as("fold"))
      .collect()
    viaLambda.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }
}
