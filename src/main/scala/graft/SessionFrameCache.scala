package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo of arbitrary values keyed by (session, K) — the
  * session-cache family's base: entries are evicted when their owning
  * session's SparkContext ends (SparkListenerApplicationEnd), so
  * long-lived JVMs that restart sessions — test suites, notebook
  * kernels — do not accumulate dead session references.
  *
  * The build runs OUTSIDE the map's bin lock: `getOrElseUpdate` publishes
  * a lazy holder via putIfAbsent and evaluates it afterwards, so a build
  * that launches Spark jobs (seconds) blocks only same-key callers — not
  * every key hashing to the same ConcurrentHashMap bin, and never
  * re-entrantly inside computeIfAbsent (which would throw
  * IllegalStateException).
  *
  * Each holder evaluates its build EXACTLY ONCE, memoizing the outcome as
  * a Try: a failed build unpins the holder from the map (so the next
  * access builds fresh, map-visible to everyone) and rethrows to every
  * thread blocked on it. A bare `lazy val value: V` would instead RETRY
  * the build inside the already-removed holder for a thread that was
  * blocked during the failure — a successful retry there would return a
  * value (e.g. a persisted DataFrame) no longer in the map, which a later
  * caller would rebuild and double-persist with no unpersist path. */
final class SessionValueCache[K, V] {

  private final class Holder(build: () => V) {
    lazy val result: scala.util.Try[V] = scala.util.Try(build())
  }

  private val map = new ConcurrentHashMap[(SparkSession, K), Holder]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    val k = (spark, key)
    var h = map.get(k)
    if (h == null) {
      hook(spark)
      val fresh = new Holder(() => build)
      h = map.putIfAbsent(k, fresh)
      if (h == null) h = fresh
    }
    h.result match {
      case scala.util.Success(v) => v
      case scala.util.Failure(e) =>
        // do not pin a permanently-failing holder: a throwing build under
        // a STALE key (e.g. a layout check) must not shadow a later
        // successful one after the cause is fixed
        map.remove(k, h)
        throw e
    }
  }

  private def hook(spark: SparkSession): Unit =
    if (hooked.add(spark)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          val it = map.keySet.iterator()
          while (it.hasNext) if (it.next()._1 eq spark) it.remove()
          hooked.remove(spark)
        }
      })
    }
}

/** Per-session cache of persisted DataFrames (the share-the-scan pattern:
  * several registered queries consume one expensive annotated/shingled
  * frame, and without a persist each would recompute it). Eviction and
  * locking semantics are [[SessionValueCache]]'s. */
final class SessionFrameCache[K] {

  private val cache = new SessionValueCache[K, DataFrame]

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => DataFrame): DataFrame =
    cache.getOrElseUpdate(spark, key)(build.persist())

  /** Like [[getOrElseUpdate]] but stores the built frame AS-IS — for
    * builders that already materialize durably (e.g. `localCheckpoint`,
    * whose blocks a second `.persist()` would copy a second time). */
  def getOrElseUpdateRaw(spark: SparkSession, key: K)(build: => DataFrame): DataFrame =
    cache.getOrElseUpdate(spark, key)(build)
}
