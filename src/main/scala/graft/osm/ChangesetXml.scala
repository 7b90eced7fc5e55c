package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OSM changeset XML → changesets DataFrame (SURVEY.md §2A A3).
  *
  * Thin facade over the "osm-changesets" DataSource V2
  * ([[ChangesetXmlSource]]); kept as the stable entry point the CLI and
  * library users call.
  */
object ChangesetXml {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("osm-changesets").load(path)
}
