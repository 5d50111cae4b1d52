package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Central registry for trained-artifact memoization — the fit-once-serve-many
  * frames (IVF cell ranking, SQ/PQ quantized indexes, the Lloyd assignment)
  * that Similarity/Clustering build once per (session, dataset dir) and every
  * consumer query reuses, mirroring how a production pipeline fits a quantizer
  * once and serves it to all readers.
  *
  * Entries hold CACHED DataFrames, so two lifecycle rules apply:
  *
  *  - If the data under a path is REWRITTEN within a live session, call
  *    [[invalidate]] (or use a new SparkSession): the memo key is only
  *    (session, path), so without invalidation the stale cached frame is
  *    silently served.
  *  - Entries whose session has been stopped are reaped on every access, so
  *    dead sessions don't pin cached plans for the driver's lifetime (their
  *    cached blocks died with the session's context; dropping the reference
  *    is all that's left to do).
  */
object ArtifactCache {
  private val caches =
    TrieMap[String, TrieMap[(SparkSession, String), DataFrame]]()

  /** Per-artifact observability: how often the fit ran vs was served from
    * the memo, and what the build closure cost. Build time covers the
    * closure only — eager builders (d9's labeled components, the Lloyd
    * assignment) are fully attributed here, while lazy-cached plans charge
    * materialization to their first consumer (Bench surfaces both so that
    * attribution is visible rather than inferred).
    *
    * Stats are keyed per (artifact, corpus-dir basename) so the bench's
    * sf0.001 warm-pass builds report separately from the measured-SF builds,
    * and `selfMillis` subtracts NESTED artifact builds (d9_components calls
    * scoredPairs calls lshSigs) so each artifact's own cost is visible
    * instead of triple-counted up the chain.
    */
  final case class ArtifactStats(builds: Long, hits: Long, buildMillis: Long,
      selfMillis: Long = 0L)
  private val stats = TrieMap[String, ArtifactStats]()
  // per-thread stack of child-build-time accumulators for exclusive timing
  private val childTime = new ThreadLocal[java.util.ArrayDeque[java.util.concurrent.atomic.AtomicLong]] {
    override def initialValue() = new java.util.ArrayDeque()
  }
  private def record(name: String, isBuild: Boolean, millis: Long, selfMillis: Long = 0L): Unit = {
    val _ = stats.updateWith(name) {
      case Some(a) if isBuild => Some(a.copy(builds = a.builds + 1,
        buildMillis = a.buildMillis + millis, selfMillis = a.selfMillis + selfMillis))
      case Some(a) => Some(a.copy(hits = a.hits + 1))
      case None if isBuild => Some(ArtifactStats(1, 0, millis, selfMillis))
      case None => Some(ArtifactStats(0, 1, 0))
    }
  }

  /** Snapshot of per-artifact build/hit counters since the last reset. */
  def statsSnapshot: Map[String, ArtifactStats] = stats.toMap
  def resetStats(): Unit = stats.clear()

  /** Memoize `build` under (`name`, session, dataset dir). `build` runs at
    * most once per live key; the produced frame is expected to be cached by
    * the builder (unpersist happens on invalidation).
    */
  def getOrElseUpdate(name: String, s: SparkSession, d: String)(build: => DataFrame): DataFrame = {
    reapStopped()
    val statKey = s"$name@${new java.io.File(d).getName}"
    val slot = caches.getOrElseUpdate(name, TrieMap.empty)
    slot.get((s, d)) match {
      case Some(df) =>
        record(statKey, isBuild = false, 0)
        df
      case None =>
        // TrieMap.getOrElseUpdate still runs `build` at most once per key
        // under a race; the flag tells losers apart so they count as hits
        var built = false
        val df = slot.getOrElseUpdate((s, d), {
          val stack = childTime.get()
          stack.push(new java.util.concurrent.atomic.AtomicLong())
          val t0 = System.nanoTime()
          val b = build
          val total = (System.nanoTime() - t0) / 1000000
          val child = stack.pop().get()
          built = true
          record(statKey, isBuild = true, total, total - child)
          // charge this build's FULL wall to the enclosing build (if any)
          // so the parent's selfMillis excludes it
          if (!stack.isEmpty) { stack.peek().addAndGet(total); () }
          b
        })
        if (!built) record(statKey, isBuild = false, 0)
        df
    }
  }

  /** Drop (and unpersist) every cached artifact for the dataset under `d` in
    * session `s` — call after rewriting data under that path mid-session.
    */
  def invalidate(s: SparkSession, d: String): Unit =
    caches.values.foreach(_.remove((s, d)).foreach(unpersistQuietly))

  /** Drop every entry (e.g. between test suites sharing one session). */
  def invalidateAll(): Unit =
    caches.values.foreach { c =>
      c.keys.foreach(k => c.remove(k).foreach(unpersistQuietly))
    }

  private def unpersistQuietly(df: DataFrame): Unit =
    try df.unpersist() catch { case _: Exception => () }

  private def reapStopped(): Unit =
    caches.values.foreach { c =>
      c.keys.filter(_._1.sparkContext.isStopped).foreach(c.remove)
    }
}
