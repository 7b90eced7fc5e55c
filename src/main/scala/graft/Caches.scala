package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry-based cache lifecycle for composed operator pipelines.
  *
  * Operators cache intermediates that are consumed more than once inside
  * one query (dictionary builds, self-join inputs). The DataFrames they
  * return are lazy, so the operator itself can never know when its
  * caches are safe to drop — a try/finally unpersist inside the builder
  * would release the cache before the caller's action ever materializes
  * it. Instead, every operator registers its cached plans here and the
  * caller (Verify, Bench, or any long-lived session composing operators)
  * drops them with [[release]] once the consuming action has run.
  * Without this, a session composing canonicalize → fingerprint →
  * sample accumulates executor storage until LRU-eviction thrash.
  *
  * Contract: call [[release]] AFTER the action that consumes an
  * operator's result. Re-running an action on a result after release is
  * still correct (lineage recomputes), just slower.
  */
object Caches {

  private val cleanups = new ConcurrentLinkedQueue[() => Unit]()

  /** Persist `ds` and register it for the next [[release]]. */
  def track[T <: Dataset[_]](ds: T): T = {
    ds.persist()
    cleanups.add(() => { ds.unpersist(blocking = false); () })
    ds
  }

  /** Persist `rdd` and register it for the next [[release]]. */
  def trackRdd[T <: RDD[_]](rdd: T,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): T = {
    rdd.persist(level)
    cleanups.add(() => { rdd.unpersist(blocking = false); () })
    rdd
  }

  /** Register an arbitrary cleanup (GraphX graphs and other third-party
    * handles that persist internally).
    */
  def trackCleanup(f: () => Unit): Unit = cleanups.add(f)

  /** Unpersist everything registered since the last release. Idempotent:
    * unpersisting an already-released plan is a no-op.
    */
  def release(): Unit = {
    var f = cleanups.poll()
    while (f != null) { f(); f = cleanups.poll() }
  }

  /** [[release]] plus a sweep of everything else: cached plans that
    * never registered here (`catalog.clearCache()` — unpersists AND
    * deregisters them) and persistent RDDs third-party internals
    * (GraphX Pregel, MLlib fits) left behind without exposing a handle.
    * Intended for between-query cleanup points (Verify/Bench), not for
    * sessions holding deliberate long-lived caches of their own.
    */
  def releaseAll(spark: SparkSession): Unit = {
    release()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  private[graft] def trackedCount: Int = cleanups.size()
}
