package graft.osm

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed `Dataset[T]` view of the OSM tables — case-class encoders for
  * the places compile-time field checks help (user-facing
  * transformations); the DataFrame form stays canonical for the
  * dynamic-schema paths. Field names/types mirror OsmSchemas exactly
  * (Decimal(9,7)/(10,7) surface as java BigDecimal).
  */
object OsmModel {

  case class Nd(ref: Long)
  case class Member(`type`: String, ref: Long, role: String)

  case class PlanetElement(
      id: Long,
      `type`: String,
      tags: Map[String, String],
      lat: java.math.BigDecimal,
      lon: java.math.BigDecimal,
      nds: Seq[Nd],
      members: Seq[Member],
      changeset: Option[Long],
      timestamp: Option[Timestamp],
      uid: Option[Long],
      user: Option[String],
      version: Long,
      visible: Boolean)

  case class Changeset(
      id: Long,
      tags: Map[String, String],
      created_at: Option[Timestamp],
      open: Boolean,
      closed_at: Option[Timestamp],
      comments_count: Option[Long],
      min_lat: java.math.BigDecimal,
      max_lat: java.math.BigDecimal,
      min_lon: java.math.BigDecimal,
      max_lon: java.math.BigDecimal,
      num_changes: Option[Long],
      uid: Option[Long],
      user: Option[String])

  def planet(df: DataFrame): Dataset[PlanetElement] = {
    import df.sparkSession.implicits._
    df.as[PlanetElement]
  }

  def changesets(df: DataFrame): Dataset[Changeset] = {
    import df.sparkSession.implicits._
    df.as[Changeset]
  }

  /** Register the planet/changesets frames as temp views so the full
    * workload runs via `spark.sql(...)` (the SQL-first surface the
    * reference's README assumes of downstream engines).
    */
  def registerViews(spark: SparkSession, planetDf: DataFrame,
      changesetsDf: Option[DataFrame] = None): Unit = {
    planetDf.createOrReplaceTempView("planet")
    planetDf.createOrReplaceTempView("planet_history")
    changesetsDf.foreach(_.createOrReplaceTempView("changesets"))
  }
}
