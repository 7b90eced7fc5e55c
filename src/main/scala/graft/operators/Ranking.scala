package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Scalable global dense-rank ids (1-based, sort order) for the distinct
  * values of a string column.
  *
  * `dense_rank() OVER (ORDER BY x)` with no partitioning forces every
  * distinct value through a single task — a scale-killer at 100 TB. This
  * helper computes the identical ids with range-repartition +
  * sort-within-partitions + `zipWithIndex`: partitions are globally
  * ordered and contiguous, so partition-offset + local index == global
  * rank, and every stage parallelizes at any corpus size.
  *
  * (`zipWithIndex` runs one extra job to count per-partition sizes; that
  * is a count-only pass, not a data collect — the ids never touch the
  * driver.)
  */
object Ranking {

  /** (keyCol, idCol) dictionary: idCol = rank of the distinct keyCol
    * value in global sort order, starting at 1.
    */
  def denseIds(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.select(col(keyCol)).distinct()
      .repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(keyCol)
    // persisted: zipWithIndex runs an eager per-partition size-count job
    // before the mapped pass — without the persist the whole
    // distinct+range-sort pipeline executes twice. Tracked in
    // graft.Caches; callers release after their consuming action.
    val rdd = graft.Caches.trackRdd(sorted.rdd)
    val ranked = rdd.zipWithIndex()
      .map { case (r, i) => Row(r.getString(0), i + 1L) }
    spark.createDataFrame(ranked,
      StructType(Seq(StructField(keyCol, StringType), StructField(idCol, LongType))))
  }
}
