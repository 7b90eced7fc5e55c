package graft.osm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Full-row decode parity between the committed fixture's two
  * encodings: `src/planet_history.osm.pbf` (PbfFixtureEncoder output,
  * read by the DSv2 PBF source) must reproduce the XML-converted
  * parquet EXACTLY — every column, every row, including tag order,
  * way-nd order and relation-member order. The gated o12/o13 queries
  * check projections of this under the DuckDB hash; this spec is the
  * column-complete version (maps/arrays can't enter the gate).
  */
class PbfFixtureParitySpec extends AnyFunSuite with Matchers with SparkSpec {

  private def canonical(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), col("type"),
        // map_entries preserves write order — tag order is part of
        // the parity claim (both decoders emit document order)
        map_entries(col("tags")).cast("array<struct<key:string,value:string>>")
          .as("tags"),
        col("lat").cast("string"), col("lon").cast("string"),
        col("nds"), col("members"), col("changeset"),
        col("timestamp").cast("string"), col("uid"), col("user"),
        col("version"), col("visible"))
      .collect().map(_.toString).sorted

  test("PBF-converted fixture equals XML-converted fixture row-for-row") {
    val pbf = graft.osm.pbf.OsmPbfSource.read(
      spark, s"${OsmFixture.dir}/src/planet_history.osm.pbf")
    val xml = OsmFixture.history(spark)
    val (p, x) = (canonical(pbf), canonical(xml))
    p.length shouldBe x.length
    // first divergence with context, not just a boolean
    p.zip(x).zipWithIndex.foreach { case ((a, b), i) =>
      withClue(s"row $i: ") { a shouldBe b }
    }
  }

  test("the committed pbf splits into multiple blobs (split planning is real)") {
    // nodes chunk at 500/block: 1,745 history rows => >= 4 data blobs;
    // a maxPartitionBytes=1 read must therefore fan out multiple
    // partitions and still see every row exactly once
    val split = spark.read.format("osm-pbf").option("maxPartitionBytes", "1")
      .load(s"${OsmFixture.dir}/src/planet_history.osm.pbf")
    split.rdd.getNumPartitions should be > 3
    split.count() shouldBe OsmFixture.history(spark).count()
  }
}
