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
  * (stdin ("-") is not supported — on a cluster, inputs are paths on a
  * shared filesystem; stage local stdin to a file first.)
  */
object Main {
  def main(args: Array[String]): Unit = {
    val usage = "usage: graft.osm.Main [--changesets] <input> <output.orc>"
    val (changesets, rest) = args.partition(_ == "--changesets")
    if (rest.length != 2) { System.err.println(usage); sys.exit(1) }
    val Array(input, output) = rest

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
