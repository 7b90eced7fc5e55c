package graft.osm

import java.io.ByteArrayOutputStream

import graft.osm.PbfTestData.{W, frameBlobCodec}

/** Test-side encoder from fixture history rows to a complete
  * `.osm.pbf` — the committed-fixture twin of [[PbfTestData]]'s
  * hand-built golden blobs. OsmFixtureGen uses it to emit
  * `fixtures/osm/src/planet_history.osm.pbf` carrying EXACTLY the rows
  * of the XML-converted parquet, so the driver's DuckDB gate can hold
  * the PBF decode path (the reference's primary entry,
  * /root/reference/src/main/java/net/mojodna/osm2orc/standalone/OsmPbf2Orc.java:54-286)
  * to the same hash as the XML path: the gated o12/o13 queries convert
  * this file LIVE and compare against oracle SQL over the XML-converted
  * parquet.
  *
  * Wire layout follows the public osmformat spec exactly as
  * [[graft.osm.pbf.PbfDecode]] reads it: DenseNodes with full
  * DenseInfo (delta-zigzag ids/lats/lons/timestamps/changesets/uids/
  * user_sids, packed versions/visibles, 0-terminated keys_vals runs),
  * Way/Relation messages with Info submessages, per-block string
  * tables (index 0 = ""), granularity 100 nanodeg / date granularity
  * 1000 ms (the spec defaults, written explicitly), zlib blobs.
  */
object PbfFixtureEncoder {

  /** One fixture element; latUnits/lonUnits are the scale-7 unscaled
    * decimal values (= nanodegrees / granularity at granularity 100),
    * tsSec the whole-second UTC timestamp. Tags/nds/members keep
    * document order.
    */
  final case class Entity(
      id: Long,
      kind: String, // node | way | relation
      tags: Seq[(String, String)],
      latUnits: Long,
      lonUnits: Long,
      nds: Seq[Long],
      members: Seq[(String, Long, String)], // (type, ref, role)
      changeset: Long,
      tsSec: Long,
      uid: Long,
      user: String,
      version: Long,
      visible: Boolean)

  private val MemberTypeEnum = Map("node" -> 0L, "way" -> 1L, "relation" -> 2L)

  /** Per-block string table: index 0 is "", then first-use order. */
  private final class Strings {
    private val idx = scala.collection.mutable.LinkedHashMap[String, Long]("" -> 0L)
    def sid(s: String): Long = idx.getOrElseUpdate(s, idx.size.toLong)
    def all: Seq[String] = idx.keys.toSeq
  }

  private def infoMsg(w: W, field: Int, e: Entity, st: Strings): Unit =
    w.msg(field) { i =>
      i.vint(1, e.version)
      i.vint(2, e.tsSec) // date_granularity 1000 → units are seconds
      i.vint(3, e.changeset)
      i.vint(4, e.uid)
      i.vint(5, st.sid(e.user))
      i.vint(6, if (e.visible) 1L else 0L)
    }

  private def blockBytes(f: (W, Strings) => Unit): Array[Byte] = {
    val body = new W
    val st = new Strings
    f(body, st) // groups first so the string table sees every string
    val blk = new W
    blk.msg(1)(stw => st.all.foreach(s => stw.str(1, s)))
    blk.vint(17, 100L) // granularity (nanodegrees)
    blk.vint(18, 1000L) // date_granularity (ms)
    val out = new ByteArrayOutputStream()
    out.write(blk.toArray)
    out.write(body.toArray)
    out.toByteArray
  }

  private def denseBlock(nodes: Seq[Entity]): Array[Byte] = blockBytes { (w, st) =>
    w.msg(2) { g =>
      g.msg(2) { d =>
        d.packedDeltaZig(1, nodes.map(_.id))
        d.msg(5) { di =>
          di.packed(1, nodes.map(_.version))
          di.packedDeltaZig(2, nodes.map(_.tsSec))
          di.packedDeltaZig(3, nodes.map(_.changeset))
          di.packedDeltaZig(4, nodes.map(_.uid))
          di.packedDeltaZig(5, nodes.map(n => st.sid(n.user)))
          di.packed(6, nodes.map(n => if (n.visible) 1L else 0L))
        }
        d.packedDeltaZig(8, nodes.map(_.latUnits))
        d.packedDeltaZig(9, nodes.map(_.lonUnits))
        // keys_vals: per node a run of (key_sid, val_sid) pairs, then 0
        d.packed(10, nodes.flatMap(n =>
          n.tags.flatMap { case (k, v) => Seq(st.sid(k), st.sid(v)) } :+ 0L))
      }
    }
  }

  private def waysBlock(ways: Seq[Entity]): Array[Byte] = blockBytes { (w, st) =>
    w.msg(2) { g =>
      ways.foreach { e =>
        g.msg(3) { m =>
          m.vint(1, e.id)
          m.packed(2, e.tags.map(t => st.sid(t._1)))
          m.packed(3, e.tags.map(t => st.sid(t._2)))
          infoMsg(m, 4, e, st)
          m.packedDeltaZig(8, e.nds)
        }
      }
    }
  }

  private def relationsBlock(rels: Seq[Entity]): Array[Byte] = blockBytes { (w, st) =>
    w.msg(2) { g =>
      rels.foreach { e =>
        g.msg(4) { m =>
          m.vint(1, e.id)
          m.packed(2, e.tags.map(t => st.sid(t._1)))
          m.packed(3, e.tags.map(t => st.sid(t._2)))
          infoMsg(m, 4, e, st)
          m.packed(8, e.members.map(mm => st.sid(mm._3)))
          m.packedDeltaZig(9, e.members.map(_._2))
          m.packed(10, e.members.map(mm => MemberTypeEnum(mm._1)))
        }
      }
    }
  }

  /** HeaderBlock: bbox(1) omitted; required_features(4) the three the
    * decoder supports for a history file.
    */
  private def headerBlock(): Array[Byte] =
    new W()
      .str(4, "OsmSchema-V0.6")
      .str(4, "DenseNodes")
      .str(4, "HistoricalInformation")
      .str(16, "graft-fixture")
      .toArray

  /** Encode the full file: header + dense-node blobs (chunked so split
    * planning sees multiple blobs) + ways blob + relations blob, all
    * zlib. Entity order inside each kind follows the input; callers
    * pass (type, id, version)-sorted rows (Sort.Type_then_ID).
    */
  def encode(entities: Seq[Entity], nodesPerBlock: Int = 500): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(frameBlobCodec("OSMHeader", headerBlock(), "zlib"))
    val nodes = entities.filter(_.kind == "node")
    val ways = entities.filter(_.kind == "way")
    val rels = entities.filter(_.kind == "relation")
    nodes.grouped(nodesPerBlock).foreach(chunk =>
      out.write(frameBlobCodec("OSMData", denseBlock(chunk), "zlib")))
    if (ways.nonEmpty)
      out.write(frameBlobCodec("OSMData", waysBlock(ways), "zlib"))
    if (rels.nonEmpty)
      out.write(frameBlobCodec("OSMData", relationsBlock(rels), "zlib"))
    out.toByteArray
  }

  /** Convert collected fixture-history rows (with `map_entries(tags)`
    * projected so tag order survives collection) into [[Entity]]s.
    * Fixture invariants asserted, not defaulted: every row carries
    * changeset/timestamp/uid/user; node coordinates are scale-7 exact;
    * timestamps are whole seconds.
    */
  def fromRows(rows: Seq[org.apache.spark.sql.Row]): Seq[Entity] = rows.map { r =>
    val kind = r.getString(r.fieldIndex("type"))
    def dec7(name: String): Long = {
      val d = r.getAs[java.math.BigDecimal](name)
      require(d != null, s"$kind ${r.getLong(r.fieldIndex("id"))}: null $name")
      d.setScale(7).unscaledValue().longValueExact()
    }
    val tsMs = r.getAs[java.sql.Timestamp](r.fieldIndex("timestamp")).getTime
    require(tsMs % 1000L == 0, s"non-whole-second fixture timestamp: $tsMs")
    Entity(
      id = r.getLong(r.fieldIndex("id")),
      kind = kind,
      tags = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("tags"))
        .map(t => (t.getString(0), t.getString(1))),
      latUnits = if (kind == "node") dec7("lat") else 0L,
      lonUnits = if (kind == "node") dec7("lon") else 0L,
      nds = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("nds")).map(_.getLong(0)),
      members = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("members"))
        .map(m => (m.getString(0), m.getLong(1), m.getString(2))),
      changeset = r.getLong(r.fieldIndex("changeset")),
      tsSec = tsMs / 1000L,
      uid = r.getLong(r.fieldIndex("uid")),
      user = r.getString(r.fieldIndex("user")),
      version = r.getLong(r.fieldIndex("version")),
      visible = r.getBoolean(r.fieldIndex("visible")))
  }
}
