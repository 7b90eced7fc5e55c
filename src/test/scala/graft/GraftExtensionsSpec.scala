package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The extensions class must make every custom expression callable from
  * pure SQL in a session configured with spark.sql.extensions — the
  * SQL-only user's path into the library.
  */
class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  /** Extensions only apply at session CREATION, and the shared test JVM
    * already has a SparkContext whose STATIC conf (where
    * `spark.sql.extensions` class names are read from) is fixed — so
    * build a fresh session over the existing context through the public
    * `withExtensions` API, which exercises the same `apply(ext)`
    * injection path the config string triggers on a real cluster.
    * Default/active sessions are cleared and restored around creation.
    */
  private lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("all injected functions resolve and compute from pure SQL") {
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp,
        |  vec_norm2(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n2,
        |  simhash_sig(array(CAST(7 AS BIGINT)), 16) AS sh,
        |  minhash_sig(array(CAST(7 AS BIGINT)))[0] AS mh,
        |  zorder(CAST(0.0 AS DECIMAL(9,7)), CAST(0.0 AS DECIMAL(10,7))) AS z
        |""".stripMargin).head()
    r.getAs[Double]("dp") shouldBe 11.0
    r.getAs[Double]("n2") shouldBe 25.0
    // h_0(7) = (4097*7 + 17) % P = 28696 -> even parity bits vote -1
    r.getAs[Long]("mh") shouldBe (4097L * 7 + 17) % 2147483647L
    r.getAs[Long]("sh") should be >= 0L
  }

  test("wrong arity is a clear error, not silent truncation") {
    val ex = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(CAST(1 AS BIGINT)), 32)").collect()
    }
    ex.getMessage should include("exactly 1 argument")
  }

  test("simhash_sig rejects a non-foldable bits argument with AnalysisException") {
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash_sig(array(CAST(1 AS BIGINT)), CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    ex.getMessage should include("foldable")
    ex.getMessage should include("simhash_sig")
  }

  test("simhash_sig accepts a foldable non-Int-literal bits argument") {
    // CAST(32 AS BIGINT) is a foldable bigint — ADVICE r2: must resolve,
    // not throw a raw IllegalArgumentException at plan time
    val r = spark.sql(
      "SELECT simhash_sig(array(CAST(7 AS BIGINT)), CAST(32 AS BIGINT)) AS sh")
      .head()
    val expect = spark.sql("SELECT simhash_sig(array(CAST(7 AS BIGINT)), 32) AS sh")
      .head().getAs[Long]("sh")
    r.getAs[Long]("sh") shouldBe expect
  }

  test("null array elements are skipped, not folded in as garbage") {
    // ADVICE r2: minhash_sig(array(1, NULL)) must equal minhash_sig(array(1))
    val r = spark.sql(
      """SELECT
        |  minhash_sig(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT))) AS m2,
        |  minhash_sig(array(CAST(1 AS BIGINT))) AS m1,
        |  simhash_sig(array(CAST(7 AS BIGINT), CAST(NULL AS BIGINT)), 16) AS s2,
        |  simhash_sig(array(CAST(7 AS BIGINT)), 16) AS s1
        |""".stripMargin).head()
    r.getAs[scala.collection.Seq[Long]]("m2") shouldBe r.getAs[scala.collection.Seq[Long]]("m1")
    r.getAs[Long]("s2") shouldBe r.getAs[Long]("s1")
  }
}
