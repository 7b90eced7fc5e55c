package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ZOrderSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("bit spreading interleaves correctly") {
    ZCurve.spread(0L) shouldBe 0L
    ZCurve.spread(1L) shouldBe 1L
    ZCurve.spread(0x1fffffL) shouldBe 0x1249249249249249L // all 21 bits spread
    // interleave is a bijection on the grid: distinct inputs → distinct codes
    val codes = for (x <- 0 until 32; y <- 0 until 32)
      yield ZCurve.spread(x.toLong) | (ZCurve.spread(y.toLong) << 1)
    codes.distinct.length shouldBe codes.length
  }

  test("spread places bit b at position 3b exactly (the o19 oracle's generated form)") {
    // the oracle SQL regenerates spread as Σ ((v>>b)&1) << 3b — pin the
    // mask cascade to that closed form on the full bit basis and on
    // random values, so the two can never drift
    for (b <- 0 until 21)
      ZCurve.spread(1L << b) shouldBe (1L << (3 * b))
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val v = rnd.nextLong().abs & 0x1fffffL
      val closed = (0 until 21).map(b => ((v >> b) & 1L) << (3 * b)).sum
      ZCurve.spread(v) shouldBe closed
    }
  }

  test("z-order clusters spatially near points") {
    val z = ZCurve.fromLatLon(51.5, -0.1)
    val near = ZCurve.fromLatLon(51.5001, -0.1001) // ~10 m away
    val far = ZCurve.fromLatLon(-33.9, 151.2)      // Sydney
    math.abs(z - near) should be < math.abs(z - far)
  }

  test("expression evaluates under codegen over decimal coords") {
    import spark.implicits._
    val df = Seq(
      (java.math.BigDecimal.valueOf(51.5), java.math.BigDecimal.valueOf(-0.1)),
      (java.math.BigDecimal.valueOf(-33.9), java.math.BigDecimal.valueOf(151.2)))
      .toDF("lat", "lon")
      .select($"lat".cast("decimal(9,7)").as("lat"), $"lon".cast("decimal(10,7)").as("lon"))
    val rows = df.select(ZOrderFunctions.zorder($"lat", $"lon").as("z")).collect()
    rows.map(_.getLong(0)) shouldBe Array(
      ZCurve.fromLatLon(51.5, -0.1), ZCurve.fromLatLon(-33.9, 151.2))
    // null coordinates (ways/relations) → null z
    val withNull = df.select(ZOrderFunctions.zorder(lit(null).cast("decimal(9,7)"), $"lon"))
      .collect()
    withNull.forall(_.isNullAt(0)) shouldBe true
  }

  test("geo-clustered ORC write keeps bbox scans narrow") {
    val pbf = graft.osm.PbfTestData.writeSample(
      java.nio.file.Files.createTempDirectory("zgeo"))
    val out = java.nio.file.Files.createTempDirectory("zorc").resolve("p.orc").toString
    val df = spark.read.format("osm-pbf").load(pbf)
    graft.osm.OrcSink.writePlanetGeoClustered(df, out)
    val back = spark.read.orc(out)
    back.count() shouldBe 7
    // nodes remain queryable by bbox after clustering
    back.filter(col("lat").between(51.4, 51.65)).count() shouldBe 2
  }

  test("o20: the z-range prefilter is a lossless, genuinely-pruning " +
    "superset of the bbox") {
    val planet = graft.osm.OsmFixture.planet(spark)
      .filter(col("type") === "node" && col("lat").isNotNull &&
        col("lon").isNotNull)
      .withColumn("zval",
        graft.functions.ZOrderFunctions.zorder(col("lat"), col("lon")))
    val zmin = graft.functions.ZCurve.fromLatLon(51.05, -0.25)
    val zmax = graft.functions.ZCurve.fromLatLon(51.25, -0.05)
    val corpus = planet.count()
    val candidates = planet.filter(col("zval").between(zmin, zmax)).count()
    val matches = planet
      .filter(col("lon").between(-0.25, -0.05) && col("lat").between(51.05, 51.25))
      .count()
    val gated = graft.osm.OsmOracle.zrangeBboxNodes(spark, "").count()
    gated shouldBe matches // losslessness (also hash-gated vs DuckDB)
    // the prune is real: a strict superset of the bbox, a strict
    // subset of the corpus
    candidates should be >= matches
    candidates should be < corpus
    // and monotonicity holds for every in-bbox point (the property
    // the literal range rests on)
    planet.filter(col("lon").between(-0.25, -0.05) &&
        col("lat").between(51.05, 51.25))
      .filter(col("zval") < zmin || col("zval") > zmax)
      .count() shouldBe 0L
  }

  test("hilbert: round-trip, adjacency law, and the Morton contrast") {
    import graft.functions.{HilbertCurve, ZCurve}
    // round trip d → (x,y) → d across the curve (sampled stride keeps
    // the sweep cheap while touching all quadrant orientations)
    val max = 1L << 32
    (0L until 20000L).foreach { i =>
      val d = i * 214748L % max
      val (x, y) = HilbertCurve.d2xy(d)
      withClue(s"d=$d (x=$x y=$y): ") {
        HilbertCurve.xy2d(x, y) shouldBe d
      }
    }
    // THE Hilbert property: consecutive curve positions are always
    // grid neighbors (Manhattan distance exactly 1) — the law Morton
    // violates at every quadrant boundary
    (0L until 8192L).foreach { d =>
      val (x1, y1) = HilbertCurve.d2xy(d)
      val (x2, y2) = HilbertCurve.d2xy(d + 1)
      withClue(s"d=$d: ") {
        math.abs(x1 - x2) + math.abs(y1 - y2) shouldBe 1L
      }
    }
    // Morton, for contrast, teleports: some consecutive z pair in the
    // same range is NOT grid-adjacent
    def unspread(v: Long): Long =
      (0 until 21).map(b => ((v >> (3 * b)) & 1L) << b).sum
    val mortonJumps = (0L until 1024L).exists { z =>
      val (x1, y1) = (unspread(z), unspread(z >> 1))
      val (x2, y2) = (unspread(z + 1), unspread((z + 1) >> 1))
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    mortonJumps shouldBe true
    // scale clamps to the 16-bit grid at both poles
    HilbertCurve.scale(-90.0, -90.0, 90.0) shouldBe 0L
    HilbertCurve.scale(90.0, -90.0, 90.0) shouldBe 65535L
    // expression and direct call agree on the fixture
    val planet = graft.osm.OsmFixture.planet(spark)
      .filter(col("type") === "node" && col("lat").isNotNull)
      .withColumn("hval",
        graft.functions.HilbertFunctions.hilbert(col("lat"), col("lon")))
      .select(col("lat").cast("double"), col("lon").cast("double"),
        col("hval"))
      .collect()
    planet should not be empty
    planet.foreach { r =>
      r.getLong(2) shouldBe HilbertCurve.fromLatLon(r.getDouble(0), r.getDouble(1))
    }
    // keep ZCurve referenced so the contrast comment stays honest
    ZCurve.fromLatLon(0.0, 0.0) should be >= 0L
  }

  test("curveLocality: Hilbert scan window is contiguous, Morton's is not") {
    val rows = graft.osm.OsmOracle.curveLocality(spark, "").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    val (hn, hCells, hSpan) = rows("hilbert")
    val (zn, zCells, zSpan) = rows("zorder")
    // same bbox rows under both curves
    hn shouldBe zn
    hn should be > 0L
    // the o23 selling point, measured on the committed fixture: the
    // Hilbert window over the bbox is exactly its cells (every cell in
    // [min, max] is visited — zero teleport stripes), while Morton's
    // window carries dead cells
    hSpan shouldBe hCells
    zSpan should be > zCells
    hSpan should be < zSpan
  }
}
