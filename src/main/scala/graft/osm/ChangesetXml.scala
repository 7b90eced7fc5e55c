package graft.osm

import java.io.InputStream
import java.sql.Timestamp
import java.time.Instant

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** OSM changeset XML → changesets DataFrame (SURVEY.md §2A A3).
  *
  * The reference SAX-parses one XML document single-threaded
  * (OsmChangesetXml2Orc.java:92-94 + ChangesetXmlHandler /
  * ChangesetElementProcessor). Here each file is one unit of
  * parallelism: a StAX pull parse streams changesets with O(1) memory
  * per task (a gzip'd XML document is not splittable — SURVEY §7.4).
  * For many files (e.g. daily replication dumps) tasks fan out
  * naturally; a single planet-wide file should be `repartition`ed
  * after parse before heavy downstream work.
  *
  * Null-handling parity (SURVEY §1.2):
  *  - absent created_at/closed_at/uid/user → NULL
  *    (ChangesetElementProcessor.java:45-63);
  *  - bbox decimals parse from the attribute *string* via BigDecimal —
  *    never through double (OsmChangesetXml2Orc.java:142-171);
  *  - root element must be <osm>, else error (ChangesetXmlHandler.java:57).
  */
object ChangesetXml {

  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = new SerializableConf(spark.sessionState.newHadoopConf())
    val files = {
      val hp = new Path(path)
      val fs = hp.getFileSystem(conf.value)
      if (fs.getFileStatus(hp).isDirectory)
        fs.listStatus(hp).filter(_.isFile).map(_.getPath.toString).toSeq
      else Seq(path)
    }
    val rows = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { f => parseFile(f, conf) }
    spark.createDataFrame(rows, OsmSchemas.Changesets)
  }

  private def parseFile(file: String,
      conf: SerializableConf): Iterator[Row] = {
    val hp = new Path(file)
    val fs = hp.getFileSystem(conf.value)
    val raw: InputStream = fs.open(hp)
    val codec = new CompressionCodecFactory(conf.value).getCodec(hp)
    val in = if (codec != null) codec.createInputStream(raw) else raw
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val reader = factory.createXMLStreamReader(in)
    new ChangesetIterator(reader, in)
  }

  private final class ChangesetIterator(r: XMLStreamReader, in: InputStream)
      extends Iterator[Row] {
    private var nextRow: Row = _
    private var done = false
    private var sawRoot = false

    // current changeset state
    private var attrs: Map[String, String] = _
    private val tags = mutable.LinkedHashMap.empty[String, String]

    private def attr(name: String): Option[String] = attrs.get(name)

    private def ts(name: String): Timestamp =
      attr(name).map(v => Timestamp.from(Instant.parse(v))).orNull

    private def dec(name: String): java.math.BigDecimal =
      // string → BigDecimal, never through double (reference parity)
      attr(name).map(new java.math.BigDecimal(_)).orNull

    private def lng(name: String): java.lang.Long =
      attr(name).flatMap(v => v.toLongOption).map(Long.box).orNull

    private def advance(): Unit = {
      nextRow = null
      while (nextRow == null && !done) {
        if (!r.hasNext) { done = true; r.close(); in.close() }
        else r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "osm" => sawRoot = true
              case "changeset" =>
                if (!sawRoot) throw new IllegalStateException(
                  "This does not appear to be an OSM changeset file.")
                attrs = (0 until r.getAttributeCount)
                  .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
                tags.clear()
              case "tag" if attrs != null =>
                tags += (r.getAttributeValue(null, "k") -> r.getAttributeValue(null, "v"))
              case other if !sawRoot => throw new IllegalStateException(
                s"This does not appear to be an OSM changeset file (root <$other>).")
              case _ => // ignore discussion/comment etc.
            }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "changeset" =>
            nextRow = Row(
              attr("id").map(_.toLong).getOrElse(
                throw new IllegalArgumentException("changeset without id")),
              tags.toMap,
              ts("created_at"),
              attr("open").map(_.toBoolean).getOrElse(false),
              ts("closed_at"),
              lng("comments_count"),
              dec("min_lat"), dec("max_lat"), dec("min_lon"), dec("max_lon"),
              lng("num_changes"),
              lng("uid"),
              attr("user").orNull)
            attrs = null
          case _ => // ignore
        }
      }
    }

    advance()
    override def hasNext: Boolean = nextRow != null
    override def next(): Row = {
      val out = nextRow
      advance()
      out
    }
  }

  /** serializable Hadoop conf for executor-side FS access. */
  class SerializableConf(@transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }
}
