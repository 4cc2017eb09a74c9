package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k Aggregator (SURVEY §2.10's custom-aggregate
  * surface): keeps at most k (id, score) pairs per group, ordered by
  * score DESC then id ASC (unique tiebreak → deterministic).
  *
  * This is the scale-correct alternative to the window-function top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY s) <= k`): the window
  * sorts every group's full row set; the Aggregator's partial/merge
  * buffers are bounded at k entries, so shuffle volume is O(groups*k)
  * and nothing ever materializes a per-group sort.
  *
  * Input rows are (group, id, score); the group key is handled by
  * groupByKey outside the Aggregator.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(String, Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortBy(t => (-t._2, t._1)).take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)], row: (String, Long, Double)): Seq[(Long, Double)] =
    trim(buf :+ ((row._2, row._3)))

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
