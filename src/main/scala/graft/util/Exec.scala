package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Distributed materialization helpers — the no-driver alternative to
  * `collectAsList + createDataFrame` for "force this frame NOW so an
  * upstream cache can be released" situations.
  */
object Exec {

  /** Materialize `df` on the EXECUTORS and return a lineage-cut view.
    *
    * Persists the frame (MEMORY_AND_DISK), forces population with one
    * distributed `count()` (an O(1)-to-driver action — only the count
    * crosses the wire, never rows), and returns a LogicalRDD view over
    * the cached plan's RDD. After this returns, any cache the input
    * plan depended on (an IVF index, an edge frame) can be unpersisted:
    * the returned view reads the populated cache, and even under
    * block eviction the backing RDD recomputes from its own retained
    * lineage, not from the released upstream handle's plan.
    *
    * The result frame STAYS cached — it is the artifact (at scale you
    * would write it out); release it via `spark.catalog.clearCache()`
    * or by keeping and unpersisting the intermediate handle when the
    * frame's lifetime matters. Same discipline as the final labels
    * frame of `Dedup.connectedComponents`.
    *
    * Contrast with `collectAsList`: that moves every row through the
    * driver — fine for top-k/stat outputs bounded in k, a scale-killer
    * for corpus-sized frames (one row per document/vector). Use THIS
    * for anything whose row count grows with the corpus.
    */
  def materializedCut(df: DataFrame): DataFrame = {
    // Internal-row cut (round-20): `df.rdd` + createDataFrame would
    // deserialize every InternalRow to an external Row and re-encode
    // it on the next action — a decode/encode pass over the whole cut
    // frame for nothing. queryExecution.toRdd executes the plan as
    // InternalRows and the shim wraps it directly; rows, schema and
    // lineage-cut semantics are unchanged. The rows coming off toRdd
    // are REUSED mutable buffers, so each must be copied before it
    // escapes the iterator — same contract (and same map(_.copy())
    // idiom) as Spark's own Dataset.checkpoint.
    //
    // The PERSIST registers on the CUT frame (the LogicalRDD view),
    // not on the input plan (round-20 flake fix): a cache entry whose
    // logical plan CONTAINS another cached subtree is marked for lazy
    // rebuild when that upstream is unpersisted — exactly what every
    // cut caller does next ("release the index, keep the labels") —
    // and Spark's tryRebuildCacheEntry path re-plans the entry on
    // whatever thread touches it first, which intermittently dies in
    // CachedRDDBuilder with a null-session plan (SparkException
    // INTERNAL_ERROR, observed ~1/8 full-suite runs). The LogicalRDD
    // plan is opaque — it contains no cached subtree — so the rebuild
    // marking can never reach a cut entry, and the race class is
    // structurally gone. Same single execution of `df`, same one
    // cache, same recompute-under-eviction story (the cut RDD's
    // retained lineage).
    val cut = org.apache.spark.sql.GraftInternal.internalCreateDataFrame(
      df.sparkSession, df.queryExecution.toRdd.map(_.copy()), df.schema)
    val p = cut.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }
}
