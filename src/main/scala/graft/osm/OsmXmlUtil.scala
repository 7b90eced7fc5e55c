package graft.osm

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{Decimal, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared plumbing for the XML-based OSM sources (changesets, osmChange)
  * — one copy of the codec-aware stream opening, InternalRow conversion
  * helpers, and the pruning policy, so a fix cannot drift between
  * sources.
  */
private[osm] object OsmXmlUtil {

  /** Open a path, transparently decompressing by extension (.gz etc.). */
  def openDecompressed(path: String, conf: Configuration): InputStream = {
    val hp = new Path(path)
    val raw = hp.getFileSystem(conf).open(hp)
    val codec = new CompressionCodecFactory(conf).getCodec(hp)
    if (codec != null) codec.createInputStream(raw) else raw
  }

  /** Run `build` (typically parser construction, which eagerly reads the
    * first record); close `in` if it throws — Spark never calls close()
    * on a PartitionReader whose constructor failed, so without this the
    * filesystem stream leaks once per failed task attempt.
    */
  def closing[A](in: InputStream)(build: => A): A =
    try build catch { case t: Throwable => try in.close() catch { case _: Throwable => }; throw t }

  /** Top-level-only column pruning: keep the caller's column selection
    * but restore each kept column's FULL datatype from `full`. Spark's
    * nested-schema pruning (on by default) may hand
    * SupportsPushDownRequiredColumns a schema with struct fields pruned
    * INSIDE arrays (e.g. members: array<struct<ref>>); our row builders
    * emit full structs, so echoing the nested-pruned schema in
    * readSchema() would misalign ordinals and crash. Declaring the full
    * nested type is always correct — Spark projects on top.
    */
  def topLevelPrune(full: StructType, pruned: StructType): StructType =
    StructType(pruned.fields.map(f => full(f.name)))

  def utf8(s: String): UTF8String = UTF8String.fromString(s)

  def tagsMap(tags: Seq[(String, String)]): ArrayBasedMapData = {
    val keys = new Array[AnyRef](tags.length)
    val vals = new Array[AnyRef](tags.length)
    var i = 0
    tags.foreach { case (k, v) => keys(i) = utf8(k); vals(i) = utf8(v); i += 1 }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  def dec(v: Option[java.math.BigDecimal], precision: Int): Any =
    v.map(b => Decimal(b.setScale(7, java.math.RoundingMode.HALF_UP), precision, 7)).orNull
}
