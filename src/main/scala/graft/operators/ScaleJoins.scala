package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for cluster-scale shapes (SURVEY §2B scale notes;
  * the brief's partitioning checklist: broadcast dims, bucketing for
  * co-location, salting for skew).
  *
  * AQE's skew-join handles most skew at runtime; saltedJoin is for the
  * pathological hot-key case AQE can't split (e.g. a single OSM node
  * referenced by millions of ways feeding a non-splittable aggregate).
  */
object ScaleJoins {

  /** Equi-join with the left (fact) side skewed on its key: each left
    * row gets a deterministic salt in [0,k) derived from the whole row
    * (same-key rows spread across salts), the right side replicates k
    * times, and the join runs on (key, salt). Result is bag-equal to the
    * plain join; the hot key's work fans out over k tasks.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, k: Int): DataFrame = {
    require(k > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(k)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(k - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** Write both sides bucketed on the join key so subsequent joins are
    * shuffle-free (co-located scan-side buckets). Bucketed tables go
    * through the session catalog (saveAsTable — bucketing metadata
    * doesn't survive a bare path write).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key —
    * planner-verified shuffle-free (the spec asserts no Exchange).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
