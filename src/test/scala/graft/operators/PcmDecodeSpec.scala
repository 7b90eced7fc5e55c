package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Multimodal.MediaRow

/** Real PCM sample decode (the m07 slice): golden WAV decodes,
  * little-endian sign extension, the 8-bit bias convention, truncated
  * and malformed payloads, and the exact feature disciplines
  * (peak/sum_abs/zero-crossing/biased checksum) that the DuckDB gate
  * recomputes from first principles.
  */
class PcmDecodeSpec extends AnyFunSuite with Matchers with SparkSpec {

  // hand-assembled canonical 16-bit mono WAV around the given samples —
  // independent of buildPcm16Wav so the encoder and decoder can't share
  // a bug
  private def handWav16(samples: Seq[Int], rate: Int = 8000,
      channels: Int = 1, extraJunkChunk: Boolean = false): Array[Byte] = {
    val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val junk: Seq[Byte] =
      if (extraJunkChunk) "LIST".getBytes("US-ASCII").toSeq ++
        Seq[Byte](3, 0, 0, 0) ++ Seq[Byte](9, 9, 9) ++ Seq[Byte](0) // odd size → pad
      else Seq.empty
    val blockAlign = channels * 2
    val fmt = Seq[Byte](1, 0) ++ Seq((channels & 0xff).toByte, 0.toByte) ++
      Seq((rate & 0xff).toByte, ((rate >> 8) & 0xff).toByte,
        ((rate >> 16) & 0xff).toByte, ((rate >> 24) & 0xff).toByte) ++
      Seq(((rate * blockAlign) & 0xff).toByte, (((rate * blockAlign) >> 8) & 0xff).toByte,
        (((rate * blockAlign) >> 16) & 0xff).toByte, (((rate * blockAlign) >> 24) & 0xff).toByte) ++
      Seq((blockAlign & 0xff).toByte, 0.toByte) ++ Seq[Byte](16, 0)
    val body = junk ++
      "fmt ".getBytes("US-ASCII").toSeq ++ Seq[Byte](16, 0, 0, 0) ++ fmt ++
      "data".getBytes("US-ASCII").toSeq ++
      Seq((data.length & 0xff).toByte, ((data.length >> 8) & 0xff).toByte, 0.toByte, 0.toByte) ++
      data
    val riffSize = 4 + body.length
    ("RIFF".getBytes("US-ASCII").toSeq ++
      Seq((riffSize & 0xff).toByte, ((riffSize >> 8) & 0xff).toByte, 0.toByte, 0.toByte) ++
      "WAVE".getBytes("US-ASCII").toSeq ++ body).toArray
  }

  test("golden 16-bit decode: samples, rate, channels recovered exactly") {
    val samples = Seq(0, 1, -1, 300, -300, 32767, -32768, 12345)
    val a = Multimodal.decodePcmSamples(handWav16(samples, rate = 44100)).get
    a.sampleRate shouldBe 44100
    a.channels shouldBe 1
    a.bitsPerSample shouldBe 16
    a.samples.toSeq shouldBe samples
  }

  test("LE sign extension: high-bit second byte decodes negative") {
    // bytes 00 80 = -32768; FF 7F = 32767; FF FF = -1
    val c = handWav16(Seq(0)) // template, then patch the data bytes
    val off = c.length - 2
    c(off) = 0x00.toByte; c(off + 1) = 0x80.toByte
    Multimodal.decodePcmSamples(c).get.samples.toSeq shouldBe Seq(-32768)
    c(off) = 0xff.toByte; c(off + 1) = 0x7f.toByte
    Multimodal.decodePcmSamples(c).get.samples.toSeq shouldBe Seq(32767)
    c(off) = 0xff.toByte; c(off + 1) = 0xff.toByte
    Multimodal.decodePcmSamples(c).get.samples.toSeq shouldBe Seq(-1)
  }

  test("buildPcm16Wav round-trips through the decoder bit-exactly") {
    val samples = Array(-32768, -4097, -96, 0, 127, 8191, 32767)
    val a = Multimodal.decodePcmSamples(
      Multimodal.buildPcm16Wav(samples, 8000)).get
    a.sampleRate shouldBe 8000
    a.samples.toSeq shouldBe samples.toSeq
    // and the hand encoder agrees byte-for-byte with buildPcm16Wav
    Multimodal.buildPcm16Wav(samples, 8000).toSeq shouldBe
      handWav16(samples.toSeq).toSeq
  }

  test("8-bit PCM is unsigned with a 128 bias") {
    // patch a hand WAV to 8-bit: blockAlign 1, bits 8, data = raw bytes
    val data = Seq(0, 1, 127, 128, 200, 255)
    val fmt = Seq[Byte](1, 0, 1, 0, 0x40, 0x1f, 0, 0, 0x40, 0x1f, 0, 0, 1, 0, 8, 0)
    val body = "fmt ".getBytes("US-ASCII").toSeq ++ Seq[Byte](16, 0, 0, 0) ++ fmt ++
      "data".getBytes("US-ASCII").toSeq ++
      Seq((data.length & 0xff).toByte, 0.toByte, 0.toByte, 0.toByte) ++
      data.map(_.toByte)
    val riffSize = 4 + body.length
    val c = ("RIFF".getBytes("US-ASCII").toSeq ++
      Seq((riffSize & 0xff).toByte, 0.toByte, 0.toByte, 0.toByte) ++
      "WAVE".getBytes("US-ASCII").toSeq ++ body).toArray
    val a = Multimodal.decodePcmSamples(c).get
    a.bitsPerSample shouldBe 8
    a.samples.toSeq shouldBe data.map(_ - 128)
  }

  test("stereo interleave preserves wire order") {
    val samples = Seq(10, -10, 20, -20, 30, -30) // L R L R L R
    val a = Multimodal.decodePcmSamples(handWav16(samples, channels = 2)).get
    a.channels shouldBe 2
    a.samples.toSeq shouldBe samples
  }

  test("odd-size junk chunk pads to even; fmt/data still found") {
    val samples = Seq(5, -6, 7)
    val a = Multimodal.decodePcmSamples(
      handWav16(samples, extraJunkChunk = true)).get
    a.samples.toSeq shouldBe samples
  }

  test("data chunk declaring more than present decodes whole frames only") {
    val c = handWav16(Seq(11, -12, 13, -14))
    // inflate the declared data size beyond the payload, drop one byte:
    // 4 declared frames, 3.5 present → 3 whole frames decode
    val dataSizeOff = c.length - 8 - 4
    c(dataSizeOff) = 100.toByte
    val truncated = c.dropRight(1)
    Multimodal.decodePcmSamples(truncated).get.samples.toSeq shouldBe Seq(11, -12, 13)
  }

  test("float/24-bit/lying-fmt payloads fall to None, never throw") {
    val good = handWav16(Seq(1, 2))
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // fmt code 3 (IEEE float) — header parses for parseWavHeader but is
    // not integer PCM
    Multimodal.decodePcmSamples(patched(c => c(20) = 3)) shouldBe None
    // 24-bit (bits = 24, blockAlign = 3)
    Multimodal.decodePcmSamples(patched { c => c(34) = 24; c(32) = 3 }) shouldBe None
    // truncated header, empty, RIFF-but-not-WAVE, junk size near 2^31
    Multimodal.decodePcmSamples(Array.emptyByteArray) shouldBe None
    Multimodal.decodePcmSamples(good.take(30)) shouldBe None
    Multimodal.decodePcmSamples(patched(c => c(8) = 'X'.toByte)) shouldBe None
    noException should be thrownBy
      Multimodal.decodePcmSamples(patched { c => c(16) = -1; c(17) = -1; c(18) = -1; c(19) = 0x7f })
  }

  test("pcmFeatures: exact peak/sum_abs/zero-crossing/checksum disciplines") {
    import spark.implicits._
    val samples = Seq(100, -200, 0, -5, 300) // crossings at 1→2 (+→−), 2→3 (−→0 counts non-negative... see below), 3→4 (0 is non-negative → −5 crosses), 4→5
    val rows = Seq(
      MediaRow(1, "audio", Multimodal.buildPcm16Wav(samples.toArray, 8000)),
      MediaRow(2, "audio", Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.pcmFeatures(rows).collect().sortBy(_.media_id)
    val f = out(0)
    f.format shouldBe "wav"
    f.n_samples shouldBe 5L
    f.peak shouldBe 300
    f.sum_abs shouldBe (100 + 200 + 0 + 5 + 300).toLong
    // sign sequence (s<0): F T F T F → transitions at every step = 4
    f.zero_crossings shouldBe 4
    val expectCk = samples.foldLeft(0L)((acc, s) => (acc * 31 + (s + 32768)) % 1000000007L)
    f.sample_checksum shouldBe expectCk
    // undecodable → stub sentinels + raw byte checksum
    out(1).format shouldBe "stub"
    out(1).n_samples shouldBe -1L
    out(1).peak shouldBe -1
  }

  test("audioFingerprints analytic goldens: constant → 0, increasing ramp → all bits") {
    import spark.implicits._
    val const = Array.fill(64)(100)
    val ramp = Array.tabulate(64)(j => j + 1) // frame energies strictly increase
    val rows = Seq(
      MediaRow(1, "audio", Multimodal.buildPcm16Wav(const, 8000)),
      MediaRow(2, "audio", Multimodal.buildPcm16Wav(ramp, 8000)),
      MediaRow(3, "audio", Array[Byte](1, 2, 3)) // undecodable → dropped
    ).toDS()
    val fp = Multimodal.audioFingerprints(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    fp(1L) shouldBe 0L // equal energies: strict < never fires
    fp(2L) shouldBe 32767L // every gradient ascends: all 15 bits
    fp.contains(3L) shouldBe false
    // width is a real knob: 64 samples at frames=32 -> 31 ascending
    // gradient bits; at frames=8 -> 7 bits
    val wide = Multimodal.audioFingerprints(rows, frames = 32).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    wide(2L) shouldBe (1L << 31) - 1
    val narrow = Multimodal.audioFingerprints(rows, frames = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    narrow(2L) shouldBe 127L
  }

  test("audioFingerprints are amplitude-scale invariant (gradient hash)") {
    import spark.implicits._
    val base = Array.tabulate(64)(j => (j % 13) - 6)
    val scaled = base.map(_ * 3)
    val rows = Seq(
      MediaRow(1, "audio", Multimodal.buildPcm16Wav(base, 8000)),
      MediaRow(2, "audio", Multimodal.buildPcm16Wav(scaled, 8000))).toDS()
    val fp = Multimodal.audioFingerprints(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    fp(1L) shouldBe fp(2L)
  }

  test("audioNearDup equals the exhaustive hamming<=2 pair set (banding is exact)") {
    val sf = "/root/testdata/sf0.001"
    val pairs = Multimodal.audioNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fp = Multimodal.audioFingerprintGate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (a, ha) <- fp; (b, hb) <- fp
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).toSet
    pairs shouldBe expected
    pairs should not be empty // planted exact dups collide at hamming 0
  }

  test("m07 gate query matches a driver-side recompute on real corpus rows") {
    val sf = "/root/testdata/sf0.001"
    val out = Multimodal.pcmGate(spark, sf).collect()
    out.length should be > 0
    val texts = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) >= 64)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val px = texts(id).substring(0, 64).map(_.toInt)
      val s = px.map(c => (c - 96) * 128)
      r.getInt(1) shouldBe 8000
      r.getInt(2) shouldBe 1
      r.getInt(3) shouldBe 16
      r.getLong(4) shouldBe 64L
      r.getInt(5) shouldBe s.map(math.abs).max
      r.getLong(6) shouldBe s.map(v => math.abs(v).toLong).sum
      r.getInt(7) shouldBe s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      r.getLong(8) shouldBe s.foldLeft(0L)((acc, v) => (acc * 31 + (v + 32768)) % 1000000007L)
    }
  }

  // —— G.711 µ-law / A-law expansion (m20 slice) ——

  private def g711Decode(code: Int, aLaw: Boolean): Int =
    Multimodal.decodePcmSamples(
      Multimodal.buildG711Wav(Array(code.toByte), 8000, aLaw)).get.samples(0)

  test("g711: published reference points decode exactly") {
    // µ-law: 0xFF/0x7F are the two zeros, 0x80/0x00 the extremes
    g711Decode(0xff, aLaw = false) shouldBe 0
    g711Decode(0x7f, aLaw = false) shouldBe 0
    g711Decode(0x80, aLaw = false) shouldBe 32124
    g711Decode(0x00, aLaw = false) shouldBe -32124
    // µ-law code 0xFE: u=1 -> mant 1, seg 0 -> (8+132)-132 = 8
    g711Decode(0xfe, aLaw = false) shouldBe 8
    // A-law: 0xD5/0x55 are +/-8 (no zero in A-law), 0xAA/0x2A extremes
    g711Decode(0xd5, aLaw = true) shouldBe 8
    g711Decode(0x55, aLaw = true) shouldBe -8
    g711Decode(0xaa, aLaw = true) shouldBe 32256
    g711Decode(0x2a, aLaw = true) shouldBe -32256
  }

  test("g711: sign-bit symmetry and per-chord monotonicity over all 256 codes") {
    for (aLaw <- Seq(false, true)) {
      val dec = Array.tabulate(256)(c => g711Decode(c, aLaw))
      // flipping the wire sign bit exactly negates the amplitude
      for (c <- 0 until 256) withClue(s"aLaw=$aLaw code=$c: ") {
        dec(c ^ 0x80) shouldBe -dec(c)
      }
      if (aLaw) {
        // A-law positive half (bit 7 SET on the wire): amplitude grows
        // with xor-folded code; every value is distinct and even
        val pos = (0 until 128).map(c => dec((c ^ 0x55) | 0x80))
        pos.distinct.size shouldBe 128
        all(pos.map(_ % 2)) shouldBe 0
        pos.zip(pos.drop(1)).foreach { case (a, b) => b should be > a }
      } else {
        // µ-law positive half (bit 7 set): complement order -> amplitude
        // DECREASES as the code increases; the two zeros coincide
        val pos = (0x80 to 0xff).map(dec)
        pos.zip(pos.drop(1)).foreach { case (a, b) => b should be < (a max 1) }
        pos.last shouldBe 0
      }
    }
  }

  test("g711: lying fmt chunks reject; 16-bit G.711 is malformed") {
    val good = Multimodal.buildG711Wav(Array.tabulate(8)(_.toByte), 8000, aLaw = false)
    Multimodal.decodePcmSamples(good) should not be None
    // block align != channel count
    val badAlign = good.clone(); badAlign(32) = 2
    Multimodal.decodePcmSamples(badAlign) shouldBe None
    // 16 declared wire bits under a companded format tag
    val bad16 = good.clone(); bad16(34) = 16
    Multimodal.decodePcmSamples(bad16) shouldBe None
    // an unknown format tag stays malformed
    val badFmt = good.clone(); badFmt(20) = 3
    Multimodal.decodePcmSamples(badFmt) shouldBe None
  }

  test("m22 resample: identity ratio is bit-exact, 2x upsample hits " +
    "exact midpoints, 3/4 matches a hand recompute incl. negatives") {
    import spark.implicits._
    def rows(samples: Array[Int]) = Seq(
      MediaRow(1L, "audio", Multimodal.buildPcm16Wav(samples, 8000))).toDS()
    val s = Array(-32768, -4097, -96, 0, 127, 8191, 32767, -1)

    // num = den = 1: the source comes back bit-for-bit at the same rate
    val id = Multimodal.resamplePcm(rows(s), 1, 1)
      .orderBy("j").collect().map(r => (r.getInt(2), r.getInt(3)))
    id.map(_._2).toSeq shouldBe s.toSeq
    id.map(_._1).toSet shouldBe Set(8000)

    // 2x upsample: even j reproduce the source, odd j are the exact
    // floor midpoint in shifted space
    val up = Multimodal.resamplePcm(rows(s), 2, 1)
      .orderBy("j").collect().map(_.getInt(3))
    up.length shouldBe 2 * s.length - 1
    s.indices.foreach(i => up(2 * i) shouldBe s(i))
    (0 until s.length - 1).foreach { i =>
      val mid = ((s(i) + 32768).toLong + (s(i + 1) + 32768)) / 2 - 32768
      up(2 * i + 1) shouldBe mid.toInt
    }

    // 3/4 downsample: full hand recompute of positions and values
    val down = Multimodal.resamplePcm(rows(s), 3, 4)
      .orderBy("j").collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    val exp = Iterator.from(0).map { j =>
      val t = j * 4; (j, t / 3, t % 3)
    }.takeWhile { case (_, q, rem) =>
      if (rem == 0) q <= s.length - 1 else q + 1 <= s.length - 1
    }.map { case (j, q, rem) =>
      val v =
        if (rem == 0) s(q)
        else ((((3 - rem).toLong * (s(q) + 32768) +
          rem.toLong * (s(q + 1) + 32768)) / 3) - 32768).toInt
      (j, 6000, v)
    }.toSeq
    down.toSeq shouldBe exp

    // empty / undecodable payloads emit nothing
    Multimodal.resamplePcm(
      Seq(MediaRow(2L, "audio", Array[Byte](1, 2, 3))).toDS(), 3, 4)
      .count() shouldBe 0L
  }

  test("silenceTrim: hand-built boundaries, all-silent, zero-trim") {
    import spark.implicits._
    def wav(s: Array[Int]) = Multimodal.buildPcm16Wav(s, 8000)
    def fold(s: Seq[Int]): Long =
      s.foldLeft(0L)((acc, x) => (acc * 31 + (x + 32768L)) % 1000000007L)
    val rows = Seq(
      // 3 quiet, 4 loud (one interior quiet survives), 2 quiet
      MediaRow(1L, "audio",
        wav(Array(0, 2, -2, 500, -300, 1, 400, -1, 2))),
      // all silent: keeps nothing
      MediaRow(2L, "audio", wav(Array(0, 1, -1, 2))),
      // loud at both edges: zero trim
      MediaRow(3L, "audio", wav(Array(-256, 0, 256))),
      // exactly-at-threshold samples count as loud
      MediaRow(4L, "audio", wav(Array(0, 256, 0)))
    ).toDS()
    val out = Multimodal.silenceTrim(rows).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))
      .toMap
    out(1L) shouldBe ((9, 3, 2, 4, fold(Seq(500, -300, 1, 400))))
    out(2L) shouldBe ((4, 4, 0, 0, 0L))
    out(3L) shouldBe ((3, 0, 0, 3, fold(Seq(-256, 0, 256))))
    out(4L) shouldBe ((3, 1, 1, 1, fold(Seq(256))))
    // gate corpus: invariants hold everywhere, both trim branches real
    val gate = Multimodal.silenceTrimGate(spark, "/root/testdata/sf0.001")
      .collect()
    gate should not be empty
    gate.foreach { r =>
      r.getInt(2) + r.getInt(3) + r.getInt(4) shouldBe r.getInt(1)
      r.getInt(4) should be > 0 // word-soup bodies always carry a space
    }
    gate.exists(_.getInt(2) > 0) shouldBe true
    gate.exists(_.getInt(2) == 0) shouldBe true
  }
}
