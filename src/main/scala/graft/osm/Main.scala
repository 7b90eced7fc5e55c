package graft.osm

import org.apache.spark.sql.SparkSession

import graft.osm.pbf.OsmPbfSource

/** CLI parity with the reference's entry point
  * (/root/reference/src/main/java/net/mojodna/osm2orc/Osm2Orc.java:12-41):
  *
  *   graft.osm.Main [--changesets] <input> <output.orc>
  *
  * PBF mode converts an OSM PBF to the planet ORC table; --changesets
  * converts changeset XML (optionally .gz) to the changesets ORC table.
  * `-` reads stdin (Osm2Orc.java:21-24,33-36): the stream is staged to a
  * temp file first — a Spark job needs a seekable, re-readable input
  * that every executor can open, which a pipe is not.
  */
object Main {

  /** Stage stdin to a deletable temp file (returned as the input path). */
  private[osm] def stageStdin(in: java.io.InputStream, suffix: String): String = {
    val f = java.io.File.createTempFile("graft-stdin", suffix)
    f.deleteOnExit()
    java.nio.file.Files.copy(in, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    f.getAbsolutePath
  }

  def main(args: Array[String]): Unit = {
    val usage = "usage: graft.osm.Main [--changesets] <input|-> <output.orc>"
    val (changesets, rest) = args.partition(_ == "--changesets")
    if (rest.length != 2) { System.err.println(usage); sys.exit(1) }
    val Array(rawInput, output) = rest
    val input =
      if (rawInput == "-")
        stageStdin(System.in, if (changesets.nonEmpty) ".xml" else ".osm.pbf")
      else rawInput

    val builder = SparkSession.builder()
      .appName("graft-osm2orc")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects the master; default to local[*] for direct runs
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()

    if (changesets.nonEmpty)
      OrcSink.writeChangesets(ChangesetXml.read(spark, input), output)
    else
      OrcSink.writePlanet(OsmPbfSource.read(spark, input), output,
        bounds = OrcSink.pbfBounds(spark, input))
    spark.stop()
  }
}
