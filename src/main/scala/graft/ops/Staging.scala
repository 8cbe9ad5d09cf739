package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Session-scoped staging tables: intermediates persisted once per
  * (session, corpus, key) and SHARED across every consumer query — both
  * across queries in one run (Bench/Verify execute the whole suite in one
  * SparkSession) and across the multiple join branches of a single query
  * (Catalyst does not dedupe common DataFrame subtrees, so an unpersisted
  * intermediate referenced by two join sides is computed twice). */
object Staging {

  private val cache =
    TrieMap.empty[(SparkSession, String, String), DataFrame]

  // driver-side artifacts (a learned merge table, a trained codebook)
  // shared across queries under the same per-pass accounting as staged
  // frames: computed once per (session, corpus, key), dropped by clear()
  private val valueCache =
    TrieMap.empty[(SparkSession, String, String), Any]

  def staged(s: SparkSession, dir: String, key: String)
            (build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((s, dir, key),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def stagedValue[T](s: SparkSession, dir: String, key: String)
                    (build: => T): T =
    valueCache.getOrElseUpdate((s, dir, key), build).asInstanceOf[T]

  /** Unpersist and forget every staged intermediate of a session. Bench
    * calls this between its warmup and timed passes: staged tables
    * materialized during warmup would otherwise turn the timed pass into
    * a cache read for every staged query, silently excluding the staged
    * computation from the official record. */
  def clear(s: SparkSession): Unit = {
    cache.keys.filter(_._1 eq s).foreach { k =>
      // blocking: lazily-removed blocks would coexist with the rebuilt
      // caches through the next pass and turn its tail into GC churn
      cache.remove(k).foreach(_.unpersist(blocking = true))
    }
    valueCache.keys.filter(_._1 eq s).foreach(valueCache.remove)
  }
}
