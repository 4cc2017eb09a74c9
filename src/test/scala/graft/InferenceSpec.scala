package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Inference

/** Batched-inference template invariants that the SQL oracle cannot
  * express: batch boundedness, exactly-once row accounting across
  * batch boundaries, and batch-size invariance of the results. */
class InferenceSpec extends AnyFunSuite with SparkSuite {

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  test("i1: every batch handed to the scorer is bounded by batchSize") {
    // The assert runs inside the executor task; a violation fails the
    // job. Batch size 7 deliberately doesn't divide partition sizes,
    // so tail batches exercise the short-final-group path.
    val out = Inference.batchedInference(docs, batchSize = 7) { batch =>
      assert(batch.nonEmpty && batch.size <= 7,
        s"batch of ${batch.size} exceeds bound 7")
      batch.map { case (id, _) => (id, batch.size.toLong) }
    }.collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) <= 7L))
  }

  test("i1: batch-size invariance — per-row, 32, and huge batches agree") {
    val byRow = Inference.batchedInference(docs, batchSize = 1)(
      Inference.surrogateScoreBatch).collect().map(r => (r.getLong(0), r.getLong(1)))
    val by32 = Inference.batchedInference(docs, batchSize = 32)(
      Inference.surrogateScoreBatch).collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBig = Inference.batchedInference(docs, batchSize = 100000)(
      Inference.surrogateScoreBatch).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(byRow.toSet == by32.toSet && by32.toSet == byBig.toSet)
    // exactly one score per document — nothing dropped or duplicated
    // at batch boundaries
    val n = docs.count()
    assert(by32.length == n && by32.map(_._1).distinct.length == n)
  }

  test("i2: the model is never invoked for cached content") {
    val cache = Inference.buildScoreCache(docs.where(col("doc_id") % 3 === 0))(
      Inference.surrogateScoreBatch)
    // The fresh-path scorer returns a marker no cached row can carry
    // (surrogate scores are < 1000): a marker on a from_cache=1 row or
    // a non-marker on a from_cache=0 row proves the hit/miss seam
    // routed a row to the wrong path.
    val out = Inference.cachedInference(docs, cache, batchSize = 7) { batch =>
      assert(batch.nonEmpty && batch.size <= 7,
        s"miss batch of ${batch.size} exceeds bound 7")
      batch.map { case (id, _) => (id, 777777L) }
    }.collect()
    val n = docs.count()
    assert(out.length == n && out.map(_.getLong(0)).distinct.length == n)
    val (hits, misses) = out.partition(_.getInt(2) == 1)
    assert(hits.nonEmpty && misses.nonEmpty)
    assert(hits.forall(_.getLong(1) < 1000L), "a cached row was re-scored")
    assert(misses.forall(_.getLong(1) == 777777L),
      "a miss row did not come from the model")
  }

  test("i2: cached and uncached runs produce identical scores") {
    val cache = Inference.buildScoreCache(docs.where(col("doc_id") % 3 === 0))(
      Inference.surrogateScoreBatch)
    val cached = Inference.cachedInference(docs, cache)(
      Inference.surrogateScoreBatch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = Inference.batchedInference(docs)(Inference.surrogateScoreBatch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cached == plain)
  }
}
