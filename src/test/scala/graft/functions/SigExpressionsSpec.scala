package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The codegen'd MinHashSig / SimHashSig expressions must be
  * bit-identical to the interpreted HOF forms that define oracle parity
  * — asserted here over the real sf0.001 corpus shingle pipeline (every
  * doc, both id schemes' value ranges: small dense dictionary ids and
  * xxhash64-sized ids).
  */
class SigExpressionsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def sidLists = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = graft.functions.Text.tokenized(docs, "doc_id", "text")
      .select($"doc_id", explode(Text.shingles($"tk")).as("sh"))
      .distinct()
    // xxhash64-range ids exercise the full 63-bit input domain
    sh.withColumn("sid", abs(xxhash64($"sh")) % lit(2147483647L))
      .groupBy($"doc_id").agg(collect_list($"sid").as("sids"))
  }

  test("minhash_sig matches the interpreted aggregate form on real docs") {
    import spark.implicits._
    val interp =
      """transform(sequence(0, 15), i ->
        |  aggregate(sids, CAST(2147483647 AS BIGINT),
        |    (m, s) -> least(m, ((4097 + 7919*i) * s + 17 + 104729*i) % 2147483647)))"""
        .stripMargin
    val rows = sidLists
      .select($"doc_id", SigFunctions.minhashSig($"sids").as("native"),
        expr(interp).as("interp"))
      .filter(!($"native" <=> $"interp"))
    rows.count() shouldBe 0
  }

  test("simhash_sig matches the interpreted form for 16 and 32 bits") {
    import spark.implicits._
    for (bits <- Seq(16, 32)) {
      val interp =
        s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, j) ->
           |  acc + IF(
           |    aggregate(sids, CAST(0 AS BIGINT), (v, s) ->
           |      v + IF((((4097 + 7919*j) * s + 17 + 104729*j) % 2147483647) % 2 = 1,
           |             CAST(1 AS BIGINT), CAST(-1 AS BIGINT))) > 0,
           |    shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin
      val bad = sidLists
        .select(SigFunctions.simhashSig($"sids", bits).as("native"),
          expr(interp).as("interp"))
        .filter(!($"native" <=> $"interp"))
      bad.count() shouldBe 0
    }
  }

  test("codegen and interpreted eval paths agree on randomized inputs") {
    // the DataFrame path runs generated code; nullSafeEval is the
    // interpreted fallback (used e.g. under codegen fallback / in
    // constant folding) — both must agree for ANY input, including
    // negatives (Java % and Spark's Remainder share sign semantics)
    import graft.functions.{MinHashSig, SimHashSig}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples: Seq[Seq[Long]] = Seq(Seq.empty[Long], Seq(0L), Seq(-1L)) ++
      (1 to 200).map { _ =>
        Seq.fill(rnd.nextInt(20))(rnd.nextLong() % 4000000000L)
      }
    val df = samples.map(Tuple1(_)).toDF("sids")
      .select($"sids", SigFunctions.minhashSig($"sids").as("mh"),
        SigFunctions.simhashSig($"sids", 32).as("sh"))
    df.collect().foreach { r =>
      val sids = r.getAs[scala.collection.Seq[Long]]("sids")
      val arr = new GenericArrayData(sids.toArray)
      val mhEval = MinHashSig(null).nullSafeEval(arr)
        .asInstanceOf[GenericArrayData].toLongArray.toSeq
      val shEval = SimHashSig(null, 32).nullSafeEval(arr).asInstanceOf[Long]
      r.getAs[scala.collection.Seq[Long]]("mh").toSeq shouldBe mhEval
      r.getAs[Long]("sh") shouldBe shEval
    }
  }

  test("empty sid list: minhash = all P, simhash = 0 (matches fold inits)") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq.empty[Long])).toDF("sids")
    val r = df.select(SigFunctions.minhashSig($"sids").as("m"),
      SigFunctions.simhashSig($"sids", 16).as("s")).head()
    r.getAs[scala.collection.Seq[Long]]("m") shouldBe Seq.fill(16)(2147483647L)
    r.getAs[Long]("s") shouldBe 0L
  }
}
