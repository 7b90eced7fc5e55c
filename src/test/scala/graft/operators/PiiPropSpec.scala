package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property-style fixture for the t14 PII scrub: random PII planted at
  * random positions in random safe filler is ALWAYS found exactly and
  * fully redacted — the operator's contract independent of the corpus
  * content. One generated batch, one Spark pass (plain scalacheck
  * generators with a pinned seed; the per-sample-Spark-job form would
  * be two orders of magnitude slower for the same coverage).
  */
class PiiPropSpec extends AnyFunSuite with Matchers with SparkSpec {

  // filler draws from letters+spaces only — by construction it cannot
  // match any of the three patterns (no digits, no @)
  private val word = Gen.chooseNum(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val filler = Gen.chooseNum(1, 5).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))

  private val email = for {
    l <- Gen.chooseNum(1, 10); local <- Gen.listOfN(l, Gen.alphaNumChar)
    d <- Gen.chooseNum(1, 8); dom <- Gen.listOfN(d, Gen.alphaLowerChar)
    t <- Gen.chooseNum(2, 4); tld <- Gen.listOfN(t, Gen.alphaLowerChar)
  } yield s"${local.mkString}@${dom.mkString}.${tld.mkString}"

  private val ip = Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString("."))

  private val phone = for {
    cc <- Gen.chooseNum(1, 99); a <- Gen.chooseNum(200, 999)
    b <- Gen.chooseNum(100, 999); c <- Gen.chooseNum(1000, 9999)
  } yield s"+$cc ($a) $b-$c"

  // a doc = PII items in RANDOM type order (the t14 stage order must
  // hold for any interleaving, so the generator must not feed items in
  // stage order) interleaved with filler, space-joined
  private val doc: Gen[(Int, Int, Int, String)] = for {
    ne <- Gen.chooseNum(0, 3); es <- Gen.listOfN(ne, email)
    ni <- Gen.chooseNum(0, 3); is <- Gen.listOfN(ni, ip)
    np <- Gen.chooseNum(0, 3); ps <- Gen.listOfN(np, phone)
    ordered = es ++ is ++ ps
    keys <- Gen.listOfN(ordered.size, Gen.chooseNum(Int.MinValue, Int.MaxValue))
    pieces <- {
      val items = keys.zip(ordered).sortBy(_._1).map(_._2) // shuffle
      Gen.listOfN(items.size + 1, filler).flatMap(fs =>
        Gen.const(fs.head + items.zip(fs.tail)
          .map { case (it, f) => s" $it $f" }.mkString))
    }
  } yield (ne, ni, np, pieces)

  test("planted PII of every kind is counted exactly and fully redacted (seeded random corpus)") {
    import spark.implicits._
    val docs = Gen.listOfN(150, doc)
      .pureApply(Gen.Parameters.default, Seed(42L))
      .zipWithIndex.map { case ((ne, ni, np, text), i) => (i.toLong, ne, ni, np, text) }
    val df = docs.toDF("doc_id", "exp_email", "exp_ip", "exp_phone", "text")
    val got = df.select(TextAnalysis.piiScrubText($"doc_id", $"text") :+
        $"exp_email" :+ $"exp_ip" :+ $"exp_phone": _*)
      .collect()
    got.length shouldBe 150
    got.foreach { r =>
      withClue(s"doc ${r.getLong(0)} clean=[${r.getString(4)}]: ") {
        r.getInt(1) shouldBe r.getInt(5) // n_email == planted
        r.getInt(2) shouldBe r.getInt(6) // n_ip == planted
        r.getInt(3) shouldBe r.getInt(7) // n_phone == planted
        val clean = r.getString(4)
        TextAnalysis.PiiEmail.r.findFirstIn(clean) shouldBe None
        TextAnalysis.PiiIp.r.findFirstIn(clean) shouldBe None
        TextAnalysis.PiiPhone.r.findFirstIn(clean) shouldBe None
      }
    }
    // the generated corpus actually exercised every pattern
    got.map(_.getInt(5)).sum should be > 0
    got.map(_.getInt(6)).sum should be > 0
    got.map(_.getInt(7)).sum should be > 0
  }
}
