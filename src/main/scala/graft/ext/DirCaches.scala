package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared (session, dir)-keyed checkpoint-cache discipline used by
  * every ext module that builds reusable index frames (shingle/minhash
  * base, PPJoin postings, LSH band tables, TF index, packing prefix, …):
  *
  *  - one TrieMap per index, registered here at module init;
  *  - `evictOtherDirs` before every build: a long-lived session walking
  *    several scale factors (Bench warmup dir → target dir) must not
  *    accumulate persisted blocks — only one dir per session is ever hot;
  *  - `clear` at Bench/Verify teardown, eagerly unpersisting checkpoint
  *    blocks via [[graft.CheckpointUtil.release]] instead of waiting for
  *    a driver GC cycle to feed the ContextCleaner.
  *
  * One instance per module (not global): each module's clearCaches()
  * remains an independent, individually-testable hook.
  */
private[graft] final class DirCaches {
  import scala.collection.concurrent.TrieMap

  private val registered =
    scala.collection.mutable.ArrayBuffer.empty[TrieMap[(SparkSession, String), DataFrame]]
  private val sideRegistered =
    scala.collection.mutable.ArrayBuffer.empty[TrieMap[(SparkSession, String), _]]

  /** Register a new index cache. Call once per index at module init. */
  def newCache(): TrieMap[(SparkSession, String), DataFrame] = synchronized {
    val m = TrieMap.empty[(SparkSession, String), DataFrame]
    registered += m
    m
  }

  /** Register a SIDE-VALUE cache (driver-memory scalars derived alongside
    * an index frame — a key width, a merge table). Same one-hot-dir
    * eviction discipline as the DataFrame caches, but entries hold no
    * checkpoint blocks, so eviction is a plain remove. */
  def newSideCache[V](): TrieMap[(SparkSession, String), V] = synchronized {
    val m = TrieMap.empty[(SparkSession, String), V]
    sideRegistered += m
    m
  }

  def evictOtherDirs(spark: SparkSession, dir: String): Unit = {
    caches.foreach { c =>
      c.keys.filter(k => k._1 == spark && k._2 != dir)
        .foreach(k => c.remove(k).foreach(graft.CheckpointUtil.release))
    }
    sideCaches.foreach { c =>
      c.keys.filter(k => k._1 == spark && k._2 != dir).foreach(c.remove)
    }
  }

  def clear(): Unit = {
    caches.foreach(c =>
      c.keys.foreach(k => c.remove(k).foreach(graft.CheckpointUtil.release)))
    sideCaches.foreach(c => c.keys.foreach(c.remove))
  }

  private def caches = synchronized(registered.toList)
  private def sideCaches = synchronized(sideRegistered.toList)
}
