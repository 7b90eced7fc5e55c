package graft.osm

import java.io.DataInputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.osm.pbf.PbfDecode

/** ORC sink with the reference's writer options + metadata sidecar
  * (SURVEY.md §2A A10, §4.3 item 2).
  *
  * Options parity with OsmPbf2Orc.java:84-98:
  *  - block padding off (smaller files on object stores, :85);
  *  - bloom filters: the reference considered `tags` and commented it
  *    out (:86) — MEASURED (SCALE.md, ProfileBloom): a tags bloom costs
  *    ~28% file size and is never consulted by Spark's reader (map-key
  *    equality does not push into the ORC SearchArgument; only
  *    IsNotNull(tags) reaches the scan), so the default here matches
  *    the reference's shipped behavior (off). Blooms DO pay on
  *    primitive high-cardinality columns probed by equality (`user`:
  *    -32% lookup time in the same measurement) — opt in per column
  *    via `bloomColumns`;
  *  - `osm.schema.version` + optional `bounds` stamped BOTH as a JSON
  *    sidecar (`_graft_metadata.json`) and into each part file's ORC
  *    footer (OrcMetadata raw-stripe rewrite) — footer parity with the
  *    reference for orc-core consumers, sidecar for directory listers.
  *
  * Scale notes: `sortWithinPartitions(type, id)` before write mirrors
  * the reference's observation that sorted runs compress better
  * (OsmPbf2Orc.java:92-94,119-120) without a global sort barrier; callers
  * wanting geographic locality can `repartitionByRange` on (type, id)
  * first — same two columns the reference planned as a sort order.
  */
object OrcSink {

  /** `sorted=false` by default: planet PBFs are already (type, id)
    * ordered, so preserving input order (like the reference's
    * single-pass writer) gets the compression benefit without paying a
    * redundant per-partition sort (~2x write time measured). Pass
    * sorted=true for unordered inputs.
    */
  def writePlanet(df: DataFrame, out: String, bounds: Option[String] = None,
      sorted: Boolean = false, bloomColumns: String = ""): Unit = {
    val toWrite = if (sorted) df.sortWithinPartitions("type", "id") else df
    val w = toWrite.write
      .mode(SaveMode.Overwrite)
      .option("orc.block.padding", "false")
    (if (bloomColumns.nonEmpty) w.option("orc.bloom.filter.columns", bloomColumns)
     else w).orc(out)
    writeSidecar(df.sparkSession, out, bounds)
    stampFooters(df.sparkSession, out, bounds)
  }

  /** Geographically-clustered planet write: range-partition + sort by
    * the Z-order curve index so spatially-near rows co-locate in ORC
    * stripes (tight lat/lon stripe stats → bbox queries skip row
    * groups). This is the reference's planned-but-unshipped
    * `Sort.Geographic` order (OsmPbf2Orc.java:92-94).
    */
  def writePlanetGeoClustered(df: DataFrame, out: String,
      bounds: Option[String] = None, bloomColumns: String = ""): Unit = {
    import org.apache.spark.sql.functions.col
    val z = graft.functions.ZOrderFunctions.zorder(col("lat"), col("lon"))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val w = df.withColumn("__z", z)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode(SaveMode.Overwrite)
      .option("orc.block.padding", "false")
    (if (bloomColumns.nonEmpty) w.option("orc.bloom.filter.columns", bloomColumns)
     else w).orc(out)
    writeSidecar(df.sparkSession, out, bounds)
    stampFooters(df.sparkSession, out, bounds)
  }

  def writeChangesets(df: DataFrame, out: String): Unit = {
    df.write
      .mode(SaveMode.Overwrite)
      .option("orc.block.padding", "false")
      .orc(out)
    writeSidecar(df.sparkSession, out, None)
    stampFooters(df.sparkSession, out, None)
  }

  /** Footer parity with the reference (OsmPbf2Orc.java:90,122-125):
    * stamp the same keys the sidecar carries into each part file's ORC
    * footer so orc-core consumers see them via getMetadataValue.
    */
  private def stampFooters(spark: org.apache.spark.sql.SparkSession, out: String,
      bounds: Option[String]): Unit = {
    val meta = Map(OsmSchemas.SchemaVersionKey -> OsmSchemas.SchemaVersion) ++
      bounds.map("bounds" -> _)
    OrcMetadata.stampDirectory(out, spark.sessionState.newHadoopConf(), meta)
  }

  private def writeSidecar(spark: org.apache.spark.sql.SparkSession, out: String,
      bounds: Option[String]): Unit = {
    val meta = Seq(
      Some(s""""${OsmSchemas.SchemaVersionKey}": "${OsmSchemas.SchemaVersion}""""),
      bounds.map(b => s""""bounds": "$b"""")).flatten.mkString("{", ", ", "}")
    val p = new Path(out, "_graft_metadata.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val os = fs.create(p, true)
    try os.write(meta.getBytes(StandardCharsets.UTF_8)) finally os.close()
  }

  /** Read the OSMHeader bbox ("left,bottom,right,top" in degrees) from a
    * PBF, if present — parity with the reference stamping PBF bounds
    * into ORC metadata (OsmPbf2Orc.java:122-125). Driver-side, reads one
    * blob.
    */
  def pbfBounds(spark: org.apache.spark.sql.SparkSession, path: String): Option[String] = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(hp)
    try {
      val data = new DataInputStream(in)
      val headerLen = data.readInt()
      val headerBytes = new Array[Byte](headerLen)
      data.readFully(headerBytes)
      val r = graft.osm.pbf.Proto.reader(headerBytes)
      var typ = ""
      var datasize = 0
      while (r.hasMore) {
        val tag = r.readTag()
        (tag >> 3) match {
          case 1 => typ = r.readString()
          case 3 => datasize = r.readVarint().toInt
          case _ => r.skip(tag & 7)
        }
      }
      if (typ != "OSMHeader") None
      else {
        val blob = new Array[Byte](datasize)
        data.readFully(blob)
        val block = Proto2HeaderBounds(PbfDecode.decompressBlob(blob))
        block
      }
    } finally in.close()
  }

  /** HeaderBlock: bbox(1) = HeaderBBox{left(1) right(2) top(3) bottom(4)}
    * sint64 nanodegrees.
    */
  private def Proto2HeaderBounds(headerBlock: Array[Byte]): Option[String] = {
    val r = graft.osm.pbf.Proto.reader(headerBlock)
    while (r.hasMore) {
      val tag = r.readTag()
      if ((tag >> 3) == 1) {
        val b = r.readSlice()
        var left, right, top, bottom = 0L
        while (b.hasMore) {
          val t2 = b.readTag()
          (t2 >> 3) match {
            case 1 => left = graft.osm.pbf.Proto.zigzag(b.readVarint())
            case 2 => right = graft.osm.pbf.Proto.zigzag(b.readVarint())
            case 3 => top = graft.osm.pbf.Proto.zigzag(b.readVarint())
            case 4 => bottom = graft.osm.pbf.Proto.zigzag(b.readVarint())
            case _ => b.skip(t2 & 7)
          }
        }
        def deg(n: Long): String =
          java.math.BigDecimal.valueOf(n, 9).stripTrailingZeros.toPlainString
        return Some(s"${deg(left)},${deg(bottom)},${deg(right)},${deg(top)}")
      } else r.skip(tag & 7)
    }
    None
  }
}
