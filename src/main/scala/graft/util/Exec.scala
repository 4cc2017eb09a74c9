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
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    // Internal-row cut (round-20): `p.rdd` + createDataFrame would
    // deserialize every cached InternalRow to an external Row and
    // re-encode it on the next action — a decode/encode pass over the
    // whole cut frame for nothing. queryExecution.toRdd reads the
    // populated cache as InternalRows and the shim wraps it directly;
    // rows, schema and lineage-cut semantics are unchanged. The rows
    // coming off toRdd are REUSED mutable buffers, so each must be
    // copied before it escapes the iterator — same contract (and same
    // map(_.copy()) idiom) as Spark's own Dataset.checkpoint.
    org.apache.spark.sql.GraftInternal.internalCreateDataFrame(
      p.sparkSession, p.queryExecution.toRdd.map(_.copy()), p.schema)
  }
}
