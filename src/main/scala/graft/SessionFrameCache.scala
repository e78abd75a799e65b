package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session cache of persisted DataFrames (the share-the-scan pattern:
  * several registered queries consume one expensive annotated/shingled
  * frame, and without a persist each would recompute it).
  *
  * Entries are evicted when their owning session's SparkContext ends
  * (SparkListenerApplicationEnd), so long-lived JVMs that restart sessions
  * — test suites, notebook kernels — do not accumulate dead session and
  * RDD references. The listener is registered once per (session, cache)
  * at first insert. */
final class SessionFrameCache[K] {

  private val map = new ConcurrentHashMap[(SparkSession, K), DataFrame]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => DataFrame): DataFrame =
    cached(spark, key)(build.persist())

  /** Like [[getOrElseUpdate]] but stores the built frame AS-IS — for
    * builders that already materialize durably (e.g. `localCheckpoint`,
    * whose blocks a second `.persist()` would copy a second time). */
  def getOrElseUpdateRaw(spark: SparkSession, key: K)(build: => DataFrame): DataFrame =
    cached(spark, key)(build)

  private def cached(spark: SparkSession, key: K)(build: => DataFrame): DataFrame =
    map.computeIfAbsent((spark, key), { _ =>
      if (hooked.add(spark)) {
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
            val it = map.keySet.iterator()
            while (it.hasNext) if (it.next()._1 eq spark) it.remove()
            hooked.remove(spark)
          }
        })
      }
      build
    })
}
