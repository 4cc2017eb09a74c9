package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batched model-inference template — the documented pattern for
  * running a real embedding / classifier / reranker model inside a
  * Spark pipeline (the n18 surrogate-scorer swap, generalized to the
  * operator every scoring stage shares).
  *
  * Why a template: model runtimes (an ONNX session, a tokenizer +
  * forward pass, an RPC to a serving tier) amortize over BATCHES, not
  * rows — per-row calls are 10-100× slower — and their handles are
  * expensive to create, so the correct Spark shape is fixed:
  *
  *   - `mapPartitions`, never a per-row UDF: the partition iterator is
  *     the unit that owns a model handle. Create the handle ONCE at
  *     iterator start (outside the batch loop), reuse it for every
  *     batch, let it close with the partition.
  *   - `Iterator.grouped(batchSize)` as the batch buffer: at most
  *     `batchSize` rows are materialized at a time — memory is
  *     O(batch), never O(partition) (a `toSeq` of the iterator is the
  *     classic OOM here).
  *   - one output row per input row, emitted lazily (`flatMap` over
  *     the scored batch), so downstream operators stream.
  *
  * The scorer this repo ships is a deterministic SURROGATE (FNV-1a of
  * the normalized text, quantized) so the i1 gate can value-check the
  * plumbing against a DuckDB replay; swapping in a real model is
  * changing ONE function — the batch-shape, schema, and partition
  * behavior the gate pins stay identical.
  */
object Inference {

  /** The generic operator: score `docs` (doc_id, text) in bounded
    * batches. `scoreBatch` receives at most `batchSize` (id,
    * normalized-text) pairs and returns one (id, quantized score) per
    * input — quantized because the correctness gate hash-compares
    * scores, and a real float logit should be quantized (or round-
    * tripped through a fixed decimal) before it participates in
    * downstream deterministic decisions anyway. Text is normalized on
    * the DataFrame side ([[Dedup.normText]], codegen) so the batch
    * function does inference only. */
  def batchedInference(docs: DataFrame, batchSize: Int = 32)
      (scoreBatch: Seq[(Long, String)] => Seq[(Long, Long)]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), Dedup.normText(col("text")).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // A real model creates its session HERE (once per partition).
        it.grouped(batchSize).flatMap(batch => scoreBatch(batch).iterator)
      }
      .toDF("doc_id", "score_q")
      .select(col("doc_id"), col("score_q").cast(LongType).as("score_q"))
  }

  /** The surrogate "model": FNV-1a 64 of the normalized text, reduced
    * to an unsigned residue in [0, 1000) — a deterministic stand-in
    * with a model-call shape (batch in, one score per row out). A real
    * implementation replaces the body with `session.run(tokenize(
    * batch))`; nothing else in the pipeline changes. */
  def surrogateScoreBatch(batch: Seq[(Long, String)]): Seq[(Long, Long)] =
    batch.map { case (id, t) =>
      (id, java.lang.Long.remainderUnsigned(Dedup.fnv64(t), 1000L))
    }
}

object InferenceQueries extends graft.QueryModule {
  import Dedup.normTextSql

  // I1 — the batched-inference template end to end: normalize →
  // partition-owned batches of 32 → surrogate scorer → one score row
  // per document, fully distributed (no driver hop anywhere). FULL
  // oracle: FNV-1a replayed per document in SQL (the d3 hash chain,
  // OracleHash.fnvFoldExpr) mod 1000 — any drift in normalization,
  // batch/row accounting (dropped or duplicated rows at batch
  // boundaries), or hash arithmetic fails value equality. Batch-size
  // boundedness and batch-vs-row equivalence are pinned in
  // InferenceSpec (not SQL-expressible).
  def defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("i1_batched_inference", Some(
      s"""WITH docs AS (SELECT doc_id, $normTextSql AS t FROM documents)
         |SELECT doc_id,
         |  CAST(${graft.operators.OracleHash.fnvFoldExpr("t")} % 1000 AS BIGINT)
         |    AS score_q
         |FROM docs""".stripMargin))((s, d) =>
      Inference.batchedInference(graft.Tables.documents(s, d), batchSize = 32)(
        Inference.surrogateScoreBatch))
  )
}
