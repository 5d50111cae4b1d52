package graft.operators

import org.apache.spark.sql.SparkSession

/** Data-derived planner mode for small-corpus artifact builds and
  * fixed-point loops, shared by the Dedup / Similarity / Graph families.
  *
  * AQE's value — post-shuffle coalescing, skew-join splitting, runtime
  * join-strategy switches — applies to multi-GB shuffle stages. On the
  * KB-sized stages of a small-corpus build chain its per-stage re-planning
  * IS the dominant cost (measured at sf0.1: ~0.6 s across the d9 chain
  * alone), so below a family-specific, corpus-derived floor the build's
  * actions run with AQE off; at scale the conf never flips. Same spirit as
  * GraphOps.edgePartitions: thresholds derive from observed row counts,
  * never from a fixed setting.
  *
  * The caller's conf value is restored in finally. Builds are synchronous
  * and the engine's drivers (Verify / Bench / tests) issue queries
  * sequentially, so the temporary session-conf scope cannot leak into a
  * concurrently-planned query in practice; the frames a build RETURNS
  * re-plan under the consumer's own conf.
  */
object BuildPlanner {
  def withAqeOffWhen[T](s: SparkSession, small: Boolean)(f: => T): T =
    if (!small) f
    else {
      val k = "spark.sql.adaptive.enabled"
      val prev = s.conf.get(k)
      s.conf.set(k, "false")
      try f finally s.conf.set(k, prev)
    }

  /** Shuffle-partition override for the same small-build regime: an
    * AQE-off build chain runs every KB-sized stage at the session's full
    * partition count (32 tasks for a 9k-row centroid update), so task
    * floors — not data — dominate chatty iterative builds. Same
    * restore-in-finally / data-derived-gate contract as [[withAqeOffWhen]];
    * at scale the conf never flips and the session count applies.
    */
  def withShufflePartitionsWhen[T](s: SparkSession, small: Boolean, n: Int)(f: => T): T =
    if (!small) f
    else {
      val k = "spark.sql.shuffle.partitions"
      val prev = s.conf.get(k)
      s.conf.set(k, n.toString)
      try f finally s.conf.set(k, prev)
    }
}
