package graft.osm

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.Deflater

/** Test-side OSM PBF *encoder* — builds tiny golden fixtures from the
  * public spec so PbfSourceSpec can round-trip the main decoder without
  * any external library or checked-in binary.
  */
object PbfTestData {

  final class W {
    private val out = new ByteArrayOutputStream()
    def varint(v0: Long): W = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    def zig(v: Long): Long = (v << 1) ^ (v >> 63)
    def tag(field: Int, wire: Int): W = varint((field << 3) | wire)
    def vint(field: Int, v: Long): W = { tag(field, 0); varint(v) }
    def sint(field: Int, v: Long): W = { tag(field, 0); varint(zig(v)) }
    def bytes(field: Int, b: Array[Byte]): W = { tag(field, 2); varint(b.length); out.write(b); this }
    def str(field: Int, s: String): W = bytes(field, s.getBytes(UTF_8))
    def packed(field: Int, vs: Seq[Long]): W = {
      val w = new W; vs.foreach(w.varint); bytes(field, w.toArray)
    }
    def packedZig(field: Int, vs: Seq[Long]): W = packed(field, vs.map(zig))
    def packedDeltaZig(field: Int, vs: Seq[Long]): W = {
      val deltas = vs.indices.map(i => if (i == 0) vs(0) else vs(i) - vs(i - 1))
      packedZig(field, deltas)
    }
    def msg(field: Int)(f: W => Unit): W = { val w = new W; f(w); bytes(field, w.toArray) }
    def toArray: Array[Byte] = out.toByteArray
  }

  def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val buf = new Array[Byte](b.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  /** Legacy .lzma (LZMA1) stream, size declared in the header — the
    * lzma_data blob format the decoder's LZMAInputStream parses.
    */
  def lzmaCompress(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new org.tukaani.xz.LZMAOutputStream(bos,
      new org.tukaani.xz.LZMA2Options(), b.length.toLong)
    out.write(b); out.close()
    bos.toByteArray
  }

  /** [4-byte BE len][BlobHeader][Blob] framing. */
  def frameBlob(blobType: String, payload: Array[Byte], compress: Boolean): Array[Byte] =
    frameBlobCodec(blobType, payload, if (compress) "zlib" else "raw")

  /** Codec-parameterized framing: raw | zlib | lzma | lz4 | zstd (every
    * Blob encoding the main decoder implements; lz4/zstd/xz compress
    * via the same jars Spark ships).
    */
  def frameBlobCodec(blobType: String, payload: Array[Byte], codec: String): Array[Byte] = {
    val blob = new W
    codec match {
      case "raw" => blob.bytes(1, payload)
      case "zlib" =>
        blob.vint(2, payload.length)
        blob.bytes(3, deflate(payload))
      case "lzma" =>
        blob.vint(2, payload.length)
        blob.bytes(4, lzmaCompress(payload))
      case "lz4" =>
        blob.vint(2, payload.length)
        blob.bytes(6, net.jpountz.lz4.LZ4Factory.fastestInstance()
          .fastCompressor().compress(payload))
      case "zstd" =>
        blob.vint(2, payload.length)
        blob.bytes(7, com.github.luben.zstd.Zstd.compress(payload))
    }
    val blobBytes = blob.toArray
    val header = new W().str(1, blobType).vint(3, blobBytes.length).toArray
    val out = new ByteArrayOutputStream()
    out.write((header.length >> 24) & 0xff); out.write((header.length >> 16) & 0xff)
    out.write((header.length >> 8) & 0xff); out.write(header.length & 0xff)
    out.write(header); out.write(blobBytes)
    out.toByteArray
  }

  /** HeaderBlock with bbox (nanodegrees). */
  def headerBlock(left: Long, right: Long, top: Long, bottom: Long): Array[Byte] =
    new W().msg(1) { b =>
      b.sint(1, left); b.sint(2, right); b.sint(3, top); b.sint(4, bottom)
    }.toArray

  /** A PrimitiveBlock containing:
    *  - DenseNodes: ids 1,2,3 at (51.5,-0.1),(51.6,-0.2),(51.7,-0.3) with
    *    tags amenity=cafe on node 1, name=x on node 3; versions 1,1,2;
    *    timestamps 1000s,2000s,3000s; changesets 100..102; uids 7,7,8;
    *    users "alice","alice","bob"; visible true,true,false
    *  - Node id 4 at (10.1234567, 20.7654321), no info
    *  - Way id 10 refs [1,2,3], highway=residential, version 3
    *  - Relation id 20 members node#1(role stop), way#10(role outer)
    */
  def primitiveBlock(): Array[Byte] = {
    // string table: 0="", then in reference order
    val strings = Seq("", "amenity", "cafe", "name", "x", "alice", "bob",
      "highway", "residential", "stop", "outer")
    def sid(s: String): Long = strings.indexOf(s).toLong

    val w = new W
    w.msg(1) { st => strings.foreach(s => st.str(1, s)) }
    // group 1: dense nodes
    w.msg(2) { g =>
      g.msg(2) { d =>
        d.packedDeltaZig(1, Seq(1L, 2L, 3L))
        d.msg(5) { di =>
          di.packed(1, Seq(1L, 1L, 2L))
          di.packedDeltaZig(2, Seq(1000L, 2000L, 3000L)) // x dateGranularity(1000) = ms
          di.packedDeltaZig(3, Seq(100L, 101L, 102L))
          di.packedDeltaZig(4, Seq(7L, 7L, 8L))
          di.packedDeltaZig(5, Seq(sid("alice"), sid("alice"), sid("bob")))
          di.packed(6, Seq(1L, 1L, 0L))
        }
        d.packedDeltaZig(8, Seq(515000000L, 516000000L, 517000000L)) // /1e7 deg (gran 100)
        d.packedDeltaZig(9, Seq(-1000000L, -2000000L, -3000000L))
        d.packed(10, Seq(sid("amenity"), sid("cafe"), 0L, 0L, sid("name"), sid("x"), 0L))
      }
    }
    // group 2: plain node, way, relation
    w.msg(2) { g =>
      g.msg(1) { n =>
        n.sint(1, 4L)
        n.sint(8, 101234567L) // x gran 100 → 10.1234567 deg
        n.sint(9, 207654321L)
      }
      g.msg(3) { wy =>
        wy.vint(1, 10L)
        wy.packed(2, Seq(sid("highway")))
        wy.packed(3, Seq(sid("residential")))
        wy.msg(4) { i =>
          i.vint(1, 3L); i.vint(2, 5000L); i.vint(3, 103L); i.vint(4, 7L)
          i.vint(5, sid("alice")); i.vint(6, 1L)
        }
        wy.packedDeltaZig(8, Seq(1L, 2L, 3L))
      }
      g.msg(4) { rel =>
        rel.vint(1, 20L)
        rel.packed(8, Seq(sid("stop"), sid("outer")))
        rel.packedDeltaZig(9, Seq(1L, 10L))
        rel.packed(10, Seq(0L, 1L))
      }
    }
    w.toArray
  }

  /** Write a complete 3-blob PBF file (header + 2 copies of the data
    * block under different compression) and return its path.
    */
  def writeSample(dir: java.nio.file.Path): String = {
    val out = new ByteArrayOutputStream()
    out.write(frameBlob("OSMHeader",
      headerBlock(-400000000L, 600000000L, 52000000000L, 51000000000L), compress = false))
    out.write(frameBlob("OSMData", primitiveBlock(), compress = true))
    out.write(frameBlob("OSMData", primitiveBlock2(), compress = false))
    val f = dir.resolve("sample.osm.pbf")
    java.nio.file.Files.write(f, out.toByteArray)
    f.toString
  }

  /** Second data block: one tagged node with explicit granularity 1000
    * + offsets, to exercise non-default coordinate decoding.
    */
  def primitiveBlock2(): Array[Byte] = {
    val strings = Seq("", "shop", "bakery")
    def sid(s: String): Long = strings.indexOf(s).toLong
    val w = new W
    w.msg(1) { st => strings.foreach(s => st.str(1, s)) }
    w.msg(2) { g =>
      g.msg(1) { n =>
        n.sint(1, 5L)
        n.packed(2, Seq(sid("shop")))
        n.packed(3, Seq(sid("bakery")))
        n.sint(8, 48000000L)  // 1000*this + offset below
        n.sint(9, -16000000L)
      }
    }
    w.vint(17, 1000L) // granularity
    w.vint(19, 500L)  // lat_offset  → lat = (500 + 1000*48000000)/1e9
    w.vint(20, 0L)
    w.toArray
  }
}
