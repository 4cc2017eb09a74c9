package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Aggregator — the
  * bounded-state alternative to `groupBy(token).count()` for frequency
  * diagnostics (vocabulary skew, hot-key detection before salting).
  *
  * The exact count shuffles one record per DISTINCT key — at 100 TB a
  * token/n-gram vocabulary runs to billions, so the shuffle is the
  * bottleneck. This sketch keeps at most 2k counters per partial buffer
  * and k after every merge, so shuffle volume is O(partitions * k)
  * regardless of vocabulary size.
  *
  * Guarantees (mergeable-summaries bound, independent of merge ORDER and
  * partitioning — which is what lets contract rows stay deterministic
  * under the local[16]-vs-local[5] audit):
  *  - no overcount: est(x) <= true(x);
  *  - undercount <= n/(k+1), n = total input count;
  *  - every key with true(x) > n/(k+1) is present in the summary.
  *
  * Prune rule: when over capacity, subtract the (k+1)-th largest counter
  * value from every counter and drop the non-positive — the standard
  * batched decrement; each prune removes >= (k+1) * cut total mass, which
  * is what bounds any single key's cumulative undercount by n/(k+1).
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  private def prune(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], t: String): Map[String, Long] = {
    val m = buf.updated(t, buf.getOrElse(t, 0L) + 1L)
    if (m.size > 2 * k) prune(m) else m // amortize: prune O(k log k) every k rows
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    prune(b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) })

  override def finish(r: Map[String, Long]): Map[String, Long] = prune(r)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
