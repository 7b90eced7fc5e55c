package graft.osm

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.osm.pbf.Proto

/** Property tests for the wire-format primitives the PBF decoder is
  * built on (varint/zigzag/packed-delta round-trips through the
  * test-side encoder). Plain scalacheck runner (no scalatestplus
  * bridge on the classpath).
  */
class ProtoPropSpec extends AnyFunSuite with Matchers {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    withClue(res.status.toString) { res.passed shouldBe true }
  }

  test("varint round-trips any long") {
    check(Prop.forAll { (v: Long) =>
      val w = new PbfTestData.W
      w.varint(v)
      Proto.reader(w.toArray).readVarint() == v
    })
  }

  test("zigzag round-trips any long") {
    check(Prop.forAll { (v: Long) =>
      val w = new PbfTestData.W
      Proto.zigzag(w.zig(v)) == v
    })
  }

  test("packed delta-zigzag round-trips any sequence") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4))) { vs =>
      val w = new PbfTestData.W
      w.packedDeltaZig(1, vs)
      val r = Proto.reader(w.toArray)
      (r.readTag() >> 3) == 1 && r.readPackedDeltaZigzag().toSeq == vs
    })
  }

  test("entity invariants on the golden fixture block") {
    import graft.osm.pbf.PbfDecode
    val entities = PbfDecode.decodePrimitiveBlock(PbfTestData.primitiveBlock()).toSeq
    entities.length shouldBe 6
    // union-encoding invariants (SURVEY §1.1)
    entities.foreach {
      case n: PbfDecode.OsmNode => n.latNano should (be >= -90000000000L and be <= 90000000000L)
      case w: PbfDecode.OsmWay => w.refs should not be empty
      case r: PbfDecode.OsmRelation =>
        r.memberTypes.length shouldBe r.memberRefs.length
        r.memberTypes.length shouldBe r.memberRoles.length
    }
  }
}
