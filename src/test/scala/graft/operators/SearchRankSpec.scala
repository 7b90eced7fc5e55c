package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** Round-4 search/ranking additions: inverted index, BM25 keyword
  * scoring, reciprocal-rank fusion, correlated scalar subqueries and
  * distribution-rank windows. Each test recomputes the operator's
  * contract independently (driver-side the DuckDB oracle re-proves the
  * same thing at sf0.01).
  */
class SearchRankSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // mirror of graft.functions.Text.toks for driver-side recomputation
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  private def docTokens(): Map[Long, Seq[String]] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap

  test("invertedIndex df/tf/postings_head match a direct recomputation") {
    val byDoc = docTokens()
    val rows = TextAnalysis.invertedIndex(spark, sf).collect()
    rows should not be empty

    val postings = byDoc.toSeq
      .flatMap { case (id, tk) => tk.distinct.map(t => (t, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val tfAll = byDoc.toSeq.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap

    rows.map(_.getString(0)).toSet shouldBe postings.keySet
    rows.foreach { r =>
      val term = r.getString(0)
      withClue(s"term $term: ") {
        r.getLong(r.fieldIndex("df")) shouldBe postings(term).size.toLong
        r.getLong(r.fieldIndex("tf")) shouldBe tfAll(term).toLong
        r.getString(r.fieldIndex("postings_head")) shouldBe
          postings(term).take(20).mkString(",")
      }
    }
  }

  test("bm25 score equals the rational-idf formula recomputed in doubles") {
    val byDoc = docTokens()
    val n = byDoc.size.toLong
    val tot = byDoc.values.map(_.size.toLong).sum
    val dfT = TextAnalysis.Bm25Terms.map(t =>
      t -> byDoc.values.count(_.contains(t)).toLong).toMap

    val rows = TextAnalysis.bm25(spark, sf).collect()
    rows should not be empty
    // exactly the docs containing >= 1 query term, each once
    val expectIds = byDoc.filter(_._2.exists(TextAnalysis.Bm25Terms.contains))
      .keys.toSeq.sorted
    rows.map(_.getLong(0)).toSeq shouldBe expectIds

    rows.foreach { r =>
      val id = r.getLong(0)
      val dl = r.getLong(r.fieldIndex("dl"))
      dl shouldBe byDoc(id).size.toLong
      val score = TextAnalysis.Bm25Terms.map { t =>
        val tf = byDoc(id).count(_ == t).toDouble
        r.getLong(r.fieldIndex(s"tf_$t")) shouldBe tf.toLong
        val df = dfT(t)
        val idf = (n - df + 0.5) / (df + 0.5)
        val norm = 0.25 + 0.75 * (dl / (tot.toDouble / n))
        (idf * (tf * 2.2)) / (tf + 1.2 * norm)
      }.reduceLeft(_ + _)
      withClue(s"doc $id: ") {
        r.getDouble(r.fieldIndex("score")) shouldBe
          BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
  }

  test("rrfFusion: ranks agree with the component retrievers, rrf is exact") {
    val rows = Similarity.rrfFusion(spark, sf).collect()
    rows should not be empty
    // per query: <= 5 rows, contiguous fused ranks from 1
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      rs.length should be <= 5
      rs.map(_.getInt(rs.head.fieldIndex("rnk"))).sorted shouldBe (1 to rs.length)
    }
    // rrf is exactly 1/(60+rank_full) + 1/(60+rank_sub)
    rows.foreach { r =>
      val rf = r.getInt(r.fieldIndex("rank_full"))
      val rs = r.getInt(r.fieldIndex("rank_sub"))
      val raw = 1.0 / (60 + rf) + 1.0 / (60 + rs)
      r.getDouble(r.fieldIndex("rrf")) shouldBe
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // rank_full of fused pairs matches the brute-force retriever's rnk
    // wherever the pair survived into the brute-force top-5
    val brute = Similarity.annBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(r.fieldIndex("rnk"))).toMap
    val checked = rows.flatMap { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .map(_ -> r.getInt(r.fieldIndex("rank_full")))
    }
    checked should not be empty
    checked.foreach { case (bruteRnk, rankFull) => rankFull shouldBe bruteRnk }
  }

  test("int8-quantized ANN: high recall and bounded score error vs exact") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = Similarity.annBruteForce(spark, sf01).collect()
    val exactCos = exact.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(r.fieldIndex("cos"))).toMap
    val truth = exact.filter(_.getInt(3) <= 3)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.annInt8(spark, sf01).collect()
    got should not be empty

    // recall@3 vs the exact top-3: int8 at 64 dims loses little
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(gotPairs).size.toDouble / truth.size
    recall should be >= 0.8

    // quantized cosine stays within the int8 error envelope of exact
    got.foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(1))).foreach { ce =>
        math.abs(r.getDouble(r.fieldIndex("cos_q")) - ce) should be <= 0.05
      }
    }
  }

  test("correlatedScalar decorrelates to the equivalent join+agg plan result") {
    import spark.implicits._
    val got = Relational.correlatedScalar(spark, sf).collect()
    got should not be empty

    val cust = Tables.customer(spark, sf)
    val cents = cust.agg(
      sum(round($"c_acctbal" * 100).cast("bigint")).as("s"),
      count(lit(1)).as("n")).collect()(0)
    val threshold = cents.getLong(0) / (cents.getLong(1) * 100.0)
    val counts = Tables.orders(spark, sf)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    val expect = cust.filter($"c_acctbal" > threshold)
      .join(counts, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_mktsegment",
        coalesce($"n_orders", lit(0L)).as("n_orders"))
      .orderBy($"c_custkey").collect()

    got.length shouldBe expect.length
    got.zip(expect).foreach { case (g, e) => g shouldBe e }
    // COUNT-bug guard: customers above the threshold with zero orders
    // must appear with 0, not vanish or read NULL
    if (expect.exists(_.getLong(2) == 0L))
      got.exists(_.getLong(2) == 0L) shouldBe true
  }

  test("lateralTopN equals the window-rank top-N spelling") {
    import spark.implicits._
    val got = Relational.lateralTopN(spark, sf).collect()
    got should not be empty

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"bal_cents".desc, $"c_custkey")
    val expect = Tables.customer(spark, sf)
      .withColumn("bal_cents", round($"c_acctbal" * 100).cast("bigint"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey", $"bal_cents")
      .orderBy($"n_name", $"bal_cents".desc, $"c_custkey")
      .collect()

    got.length shouldBe expect.length
    got.zip(expect).foreach { case (g, e) => g shouldBe e }
  }

  test("langIdEval accuracy equals recomputation from predictions and labels") {
    import spark.implicits._
    val rows = TextAnalysis.langIdEval(spark, sf).collect()
    rows should not be empty
    val preds = TextAnalysis.langId(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = Tables.documents(spark, sf).select("doc_id", "lang", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bySource = labels.filter(l => preds.contains(l._1)).groupBy(_._3)
    rows.foreach { r =>
      val src = r.getString(0)
      val docs = bySource(src)
      withClue(s"source $src: ") {
        r.getLong(1) shouldBe docs.length.toLong
        val correct = docs.count(l => preds(l._1) == l._2).toLong
        r.getLong(2) shouldBe correct
        r.getDouble(3) shouldBe BigDecimal(correct.toDouble / docs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
  }

  test("cohortRetention: week-0 row holds the full cohort, offsets nonnegative") {
    import spark.implicits._
    val rows = Relational.cohortRetention(spark, sf).collect()
    rows should not be empty
    rows.foreach(r => r.getInt(1) should be >= 0)
    // every user is active on their own first day, so the week-0 cell
    // of each cohort counts the whole cohort
    val cohortSizes = Tables.events(spark, sf)
      .select($"user_id", $"ts".cast("date").as("day"))
      .groupBy($"user_id").agg(min($"day").as("cohort_day"))
      .groupBy($"cohort_day").count()
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val weekZero = rows.filter(_.getInt(1) == 0)
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    weekZero shouldBe cohortSizes
  }

  test("rankVariants: percent_rank/cume_dist/ntile match hand recomputation") {
    val rows = Relational.rankVariants(spark, sf).collect()
    rows should not be empty
    rows.groupBy(_.getString(1)).foreach { case (_, part) =>
      val n = part.length
      val sorted = part.sortBy(r => (r.getString(2), r.getLong(0)))
      // per status group: rank = rows strictly before the group + 1
      val byStatus = sorted.groupBy(_.getString(2))
      val starts = byStatus.keys.toSeq.sorted
        .foldLeft(Map.empty[String, Int] -> 0) { case ((m, acc), st) =>
          (m + (st -> acc), acc + byStatus(st).length)
        }._1
      part.foreach { r =>
        val st = r.getString(2)
        val rank = starts(st) + 1
        val through = starts(st) + byStatus(st).length
        val pct = if (n == 1) 0.0 else (rank - 1).toDouble / (n - 1)
        withClue(s"order ${r.getLong(0)}: ") {
          r.getDouble(r.fieldIndex("pct_rank")) shouldBe
            BigDecimal(pct).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          r.getDouble(r.fieldIndex("cume")) shouldBe
            BigDecimal(through.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
      // ntile over the total order: first (n % 4) buckets one row larger
      val q = n / 4; val rem = n % 4
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expected =
          if (i < (q + 1) * rem) i / (q + 1) + 1
          else rem + (i - (q + 1) * rem) / q + 1
        withClue(s"order ${r.getLong(0)} idx $i: ") {
          r.getInt(r.fieldIndex("quartile")) shouldBe expected
        }
      }
    }
  }

  test("rankVariants sharded-rank plan == the direct (funnel) window form, row for row") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wTies = Window.partitionBy($"o_orderpriority").orderBy($"o_orderstatus")
    val wTotal = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_orderstatus", $"o_orderkey")
    val direct = Tables.orders(spark, sf)
      .filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", $"o_orderpriority", $"o_orderstatus")
      .withColumn("quartile", ntile(4).over(wTotal).cast("int"))
      .withColumn("pct_rank", round(percent_rank().over(wTies), 6))
      .withColumn("cume", round(cume_dist().over(wTies), 6))
      .orderBy($"o_orderkey").collect()
    val sharded = Relational.rankVariants(spark, sf).collect()
    try sharded.map(_.toSeq).toSeq shouldBe direct.map(_.toSeq).toSeq
    finally graft.Caches.releaseAll(spark)
  }
}
