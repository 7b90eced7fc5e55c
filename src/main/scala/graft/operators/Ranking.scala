package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** ROW-level global ranks (1-based) over a composite sort key — the
    * [[denseIds]] idiom generalized: every input row comes back with
    * all its columns plus `idCol` = its 1-based position in the global
    * `keys` sort order. Same scale story (range-repartition +
    * sort-within-partitions + `zipWithIndex`; no single-task window).
    *
    * `keys` MUST be a total order over the input (no two rows equal on
    * all keys) — ties would make the assigned ranks partition-dependent.
    * Callers append a unique tiebreak column to guarantee this.
    */
  def rowRanks(df: DataFrame, idCol: String, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
    // persisted for the same reason as denseIds: zipWithIndex's eager
    // size-count job would otherwise run the sort pipeline twice
    val rdd = graft.Caches.trackRdd(sorted.rdd)
    val ranked = rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(ranked, sorted.schema.add(idCol, LongType))
  }
}
