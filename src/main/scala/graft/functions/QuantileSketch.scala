package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic mergeable quantile sketch (Munro-Paterson / MRL
  * merge-and-prune) as a typed Aggregator — the bounded-state partner
  * of [[MisraGriesAggregator]] for rank statistics: exact percentiles
  * shuffle every distinct value; this keeps O(k log(n/k)) values per
  * buffer, so shuffle volume is independent of cardinality.
  *
  * Structure: one buffer per LEVEL; a level-i entry stands for 2^i
  * original values. A buffer reaching 2k entries is compacted — sorted,
  * every second entry (odd 0-based index) promoted one level with
  * doubled weight, an odd leftover stays. No randomness anywhere, so
  * the WORST-CASE bound below is deterministic, not probabilistic (a
  * KLL-style coin flip would give a tighter expected bound the
  * correctness gate could not pin).
  *
  * Rank-error bound, independent of partitioning and merge order: one
  * compaction at level i perturbs any rank by <= 2^i and consumes
  * >= 2k * 2^i input mass, so level i compacts <= n/(2k*2^i) times and
  * contributes <= n/(2k) total error; a level exists only once its
  * input mass does, so levels <= floor(log2(n/k)) and
  *   |estRank(v) - trueRank(v)| <= maxLevel * n / (2k).
  * Query granularity adds <= 2^maxLevel <= n/k. Returned quantile
  * values are always REAL input elements (compaction selects, never
  * interpolates), which is what lets an exact oracle rank them.
  */
class QuantileSketchAggregator(k: Int)
    extends Aggregator[Double, Seq[Seq[Double]], Seq[Seq[Double]]] {
  require(k >= 2, s"quantile sketch needs k >= 2, got $k")

  /** Compact every level with >= 2k entries, cascading upward. */
  private def carry(levels: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val out = scala.collection.mutable.ArrayBuffer(levels.map(_.toVector): _*)
    var i = 0
    while (i < out.length) {
      if (out(i).size >= 2 * k) {
        val sorted = out(i).sorted
        val s = sorted.size - sorted.size % 2
        val promoted = (1 until s by 2).map(sorted)
        out(i) = sorted.drop(s) // odd leftover keeps its level
        if (i + 1 >= out.length) out += Vector.empty
        out(i + 1) = out(i + 1) ++ promoted
      }
      i += 1
    }
    out.toSeq
  }

  override def zero: Seq[Seq[Double]] = Seq(Vector.empty)

  override def reduce(buf: Seq[Seq[Double]], x: Double): Seq[Seq[Double]] = {
    val updated = buf.updated(0, buf.head :+ x)
    if (updated.head.size >= 2 * k) carry(updated) else updated
  }

  override def merge(a: Seq[Seq[Double]], b: Seq[Seq[Double]]): Seq[Seq[Double]] =
    carry(a.zipAll(b, Vector.empty[Double], Vector.empty[Double])
      .map { case (x, y) => x ++ y })

  override def finish(r: Seq[Seq[Double]]): Seq[Seq[Double]] = r.map(_.sorted)

  override def bufferEncoder: Encoder[Seq[Seq[Double]]] =
    ExpressionEncoder[Seq[Seq[Double]]]()

  override def outputEncoder: Encoder[Seq[Seq[Double]]] =
    ExpressionEncoder[Seq[Seq[Double]]]()
}

object QuantileSketch {

  /** Total input mass represented by the sketch (exact: weights are
    * exact per level). */
  def mass(levels: Seq[Seq[Double]]): Long =
    levels.zipWithIndex.map { case (l, i) => l.size.toLong << i }.sum

  /** Estimated rank of `v`: weighted count of entries strictly below. */
  def estRank(levels: Seq[Seq[Double]], v: Double): Long =
    levels.zipWithIndex.map { case (l, i) => l.count(_ < v).toLong << i }.sum

  /** The value whose weighted cumulative mass first reaches q*n — always
    * an actual input element. */
  def quantile(levels: Seq[Seq[Double]], q: Double): Double = {
    val entries = levels.zipWithIndex
      .flatMap { case (l, i) => l.map(v => (v, 1L << i)) }
      .sortBy(_._1)
    val n = entries.map(_._2).sum
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    entries.find { case (_, w) => { cum += w; cum >= target } }
      .map(_._1).getOrElse(entries.last._1)
  }

  /** floor(log2(m)) + 1 for m >= 1 (bit length) — integer-exact, so the
    * DuckDB twin (length(bin(m))) can reproduce it without touching
    * floating-point log. */
  def bitLength(m: Long): Int =
    if (m <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m)

  /** The deterministic worst-case contract bound used by the gate row:
    * maxLevel*n/(2k) compaction error + 2n/k walk granularity, in
    * integer arithmetic (+1 swallows both floor divisions), with
    * maxLevel bounded analytically by bitLength(n/k) - 1 <= log2(n/k)
    * so the oracle can recompute it from n and k alone. */
  def contractBound(n: Long, k: Int): Long = {
    val maxLevel = math.max(0, bitLength(n / k) - 1).toLong
    maxLevel * n / (2L * k) + 2L * n / k + 1L
  }
}
