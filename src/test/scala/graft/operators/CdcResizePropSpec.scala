package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property-style fixtures for the round-10 third-batch operators:
  * random inputs, pinned seed, one Spark pass per property (the
  * PiiPropSpec economy — per-sample Spark jobs would be two orders of
  * magnitude slower for the same coverage).
  */
class CdcResizePropSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val word = Gen.chooseNum(1, 6).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("cdcChunks properties: exact partition + prefix-edit suffix stability") {
    import spark.implicits._
    // 30 random docs (5..200 tokens) and for each an edited twin with
    // 1..5 random tokens PREPENDED, doc_id = base + 1000
    val docsGen = Gen.listOfN(30, for {
      n <- Gen.chooseNum(5, 200)
      toks <- Gen.listOfN(n, word)
      k <- Gen.chooseNum(1, 5)
      pre <- Gen.listOfN(k, word)
    } yield (toks, pre))
    val drawn = sample(docsGen, 20260814L)
    val rows = drawn.zipWithIndex.flatMap { case ((toks, pre), i) =>
      Seq((i.toLong, toks.mkString(" ")),
        (i.toLong + 1000L, (pre ++ toks).mkString(" ")))
    }
    val out = TextAnalysis.cdcChunksFrames(rows.toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getLong(1)) }
    drawn.zipWithIndex.foreach { case ((toks, pre), i) =>
      val base = out(i.toLong)
      val edited = out(i.toLong + 1000L)
      withClue(s"doc $i: ") {
        // partition: chunk_nos contiguous from 0, counts sum to the
        // token count, starts gapless
        base.map(_.getLong(1)).toSeq shouldBe base.indices.map(_.toLong)
        base.map(_.getLong(3)).sum shouldBe toks.length.toLong
        base.head.getLong(2) shouldBe 0L
        base.sliding(2).foreach {
          case Array(a, b) => b.getLong(2) shouldBe a.getLong(2) + a.getLong(3)
          case _ =>
        }
        edited.map(_.getLong(3)).sum shouldBe (toks.length + pre.length).toLong
        // boundary locality: boundaries depend only on the trailing
        // window, so past the FIRST base cut both docs chunk
        // identically — the edited hash sequence must END WITH the
        // base sequence minus its first chunk, exactly
        val baseTail = base.map(_.getString(4)).drop(1).toSeq
        val editedHashes = edited.map(_.getString(4)).toSeq
        editedHashes.takeRight(baseTail.length) shouldBe baseTail
      }
    }
  }

  test("resizeRaster properties: integer-factor up/down round-trips to identity") {
    import Multimodal.RasterImage
    val imgGen = for {
      w <- Gen.chooseNum(1, 12)
      h <- Gen.chooseNum(1, 12)
      ch <- Gen.oneOf(1, 3)
      px <- Gen.listOfN(w * h * ch, Gen.chooseNum(0, 255))
      f <- Gen.chooseNum(2, 4)
    } yield (RasterImage(if (ch == 1) "pgm" else "ppm", w, h, ch,
      px.map(_.toByte).toArray), f)
    val cases = sample(Gen.listOfN(60, imgGen), 814L)
    cases.foreach { case (img, f) =>
      withClue(s"${img.width}x${img.height}x${img.channels} f=$f: ") {
        // identity
        Multimodal.resizeRaster(img, img.width, img.height)
          .pixels.toSeq shouldBe img.pixels.toSeq
        // upscale by an integer factor then downscale back: every
        // sample map composes to the identity (up picks src(y/f,x/f),
        // down picks up(y*f,x*f) = src(y,x)) — catches any off-by-one
        // in the index arithmetic, channel interleaving included
        val up = Multimodal.resizeRaster(img, img.width * f, img.height * f)
        (up.width, up.height, up.channels) shouldBe
          ((img.width * f, img.height * f, img.channels))
        up.pixels.length shouldBe img.pixels.length * f * f
        val back = Multimodal.resizeRaster(up, img.width, img.height)
        back.pixels.toSeq shouldBe img.pixels.toSeq
        back.format shouldBe img.format
      }
    }
  }
}
