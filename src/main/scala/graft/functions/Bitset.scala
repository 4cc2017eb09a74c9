package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bitset-OR Aggregator — the distributed build side of the Bloom
  * filter (ScaleOps.buildBloom): input rows are bit positions, the
  * buffer IS the bitset, partials OR-merge. The driver receives one
  * nBits/8-byte array regardless of key count — the whole point of a
  * Bloom build vs collecting the key set.
  */
class BitsetAggregator(nBits: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(nBits % 64 == 0, s"nBits must be a multiple of 64, got $nBits")

  override def zero: Array[Long] = new Array[Long](nBits / 64)

  override def reduce(buf: Array[Long], bit: Long): Array[Long] = {
    buf((bit >> 6).toInt) |= (1L << (bit & 63).toInt)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
