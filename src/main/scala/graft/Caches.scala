package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** A releasable registry of cached plans owned by ONE pipeline.
  *
  * Obtained from [[Caches.scope]]; while it is the calling thread's
  * innermost open scope, every operator cache registration lands here,
  * and [[release]] drops exactly those — a consumer releasing its own
  * pipeline can no longer clobber caches a concurrent consumer of the
  * same session still needs (advisor round-3 finding).
  */
final class CacheScope private[graft] () {
  private val cleanups = new ConcurrentLinkedQueue[() => Unit]()

  @volatile private[graft] var closed: Boolean = false

  private[graft] def add(f: () => Unit): Unit = cleanups.add(f)

  private[graft] def drain(): Unit = {
    var f = cleanups.poll()
    while (f != null) { f(); f = cleanups.poll() }
  }

  private[graft] def size: Int = cleanups.size()

  /** Unpersist everything this scope tracked and close it (subsequent
    * registrations on the opener thread fall through to the enclosing
    * scope). Idempotent, and safe to call from any thread: closing
    * only flips a flag — the opener thread's stack lazily prunes
    * closed scopes on its next registration, so a supervisor releasing
    * a worker's scope cannot corrupt the worker's thread-local state.
    */
  def release(): Unit = { closed = true; drain() }
}

/** Registry-based cache lifecycle for composed operator pipelines.
  *
  * Operators cache intermediates that are consumed more than once inside
  * one query (dictionary builds, self-join inputs). The DataFrames they
  * return are lazy, so the operator itself can never know when its
  * caches are safe to drop — a try/finally unpersist inside the builder
  * would release the cache before the caller's action ever materializes
  * it. Instead, every operator registers its cached plans here and the
  * caller (Verify, Bench, or any long-lived session composing operators)
  * drops them once the consuming action has run.
  *
  * Two granularities:
  *  - `val s = Caches.scope(); <build pipeline>; <run actions>;
  *    s.release()` — registrations made on the calling thread while the
  *    scope is open belong to it, and its release touches nothing else.
  *    This is the form for sessions with CONCURRENT consumers.
  *  - unscoped: registrations land in a default session-global scope;
  *    [[release]] drains it. Fine for one-pipeline-at-a-time sessions
  *    (Verify/Bench between queries).
  *
  * Contract: call release AFTER the action that consumes an operator's
  * result. Re-running an action on a result after release is still
  * correct (lineage recomputes), just slower.
  */
object Caches {

  private val defaultScope = new CacheScope()

  private val stack = new ThreadLocal[List[CacheScope]] {
    override def initialValue(): List[CacheScope] = Nil
  }

  /** Open a pipeline-scoped registry and make it the calling thread's
    * registration target until released (scopes nest; innermost open
    * scope wins). The caller owns the release: wrap in try/finally, or
    * use [[scoped]] which does it for you — a scope that is never
    * released keeps receiving this thread's registrations.
    */
  def scope(): CacheScope = {
    val s = new CacheScope()
    stack.set(s :: stack.get)
    s
  }

  /** Bracket form: open a scope, run `f` with it, release on ALL exits
    * (including exceptions — registrations made before the failure are
    * unpersisted, nothing leaks onto the thread's scope stack).
    */
  def scoped[T](f: CacheScope => T): T = {
    val s = scope()
    try f(s) finally s.release()
  }

  private def current: CacheScope = {
    // lazily prune scopes released (possibly from another thread)
    // since this thread last registered
    val open = stack.get.dropWhile(_.closed)
    stack.set(open)
    open match {
      case s :: _ => s
      case Nil => defaultScope
    }
  }

  /** Persist `ds` and register it with the current scope. */
  def track[T <: Dataset[_]](ds: T): T = {
    ds.persist()
    current.add(() => { ds.unpersist(blocking = false); () })
    ds
  }

  /** Persist `rdd` and register it with the current scope. */
  def trackRdd[T <: RDD[_]](rdd: T,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): T = {
    rdd.persist(level)
    current.add(() => { rdd.unpersist(blocking = false); () })
    rdd
  }

  /** Register an arbitrary cleanup (GraphX graphs and other third-party
    * handles that persist internally) with the current scope.
    */
  def trackCleanup(f: () => Unit): Unit = current.add(f)

  /** Unpersist everything registered UNSCOPED since the last release.
    * Open scopes are untouched — their owners release them. Idempotent:
    * unpersisting an already-released plan is a no-op.
    */
  def release(): Unit = defaultScope.drain()

  /** [[release]] plus a sweep of everything else: cached plans that
    * never registered here (`catalog.clearCache()` — unpersists AND
    * deregisters them) and persistent RDDs third-party internals
    * (GraphX Pregel, MLlib fits) left behind without exposing a handle.
    * SESSION-GLOBAL by design — it clears scoped consumers' caches too
    * (they stay correct, lineage recomputes). Intended for the
    * between-query cleanup points of a session that owns the whole JVM
    * (Verify/Bench), never for a shared session with live concurrent
    * consumers — those release their own [[scope]]s.
    */
  def releaseAll(spark: SparkSession): Unit = {
    release()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  private[graft] def trackedCount: Int = defaultScope.size
}
