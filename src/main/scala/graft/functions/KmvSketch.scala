package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002): keep
  * the k smallest DISTINCT hash values of a stream; if the kth smallest,
  * normalized to (0,1], is u_k, then (k-1)/u_k estimates the distinct
  * count. Unlike HLL this sketch is exactly replayable by any engine —
  * the k minima of a value set are order-independent, so the DuckDB
  * oracle reproduces the estimate bit-for-bit (same md5-derived hashes,
  * same single IEEE division).
  *
  * Scale shape: a true bounded-state aggregate — each partial buffer is
  * ≤ k longs regardless of input size, merges are k-way set unions, so
  * the shuffle carries k values per (group × partition) instead of the
  * group's full distinct set. This is the sketch path next to an exact
  * `countDistinct` (whose two-phase shuffle is distinct-set-sized).
  */
object KmvSketch {

  /** typed bounded-buffer aggregator over 60-bit non-negative hashes */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0)
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, v)
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      b2.foldLeft(b1)(insert)
    def finish(r: Array[Long]): Array[Long] = r
    // buffer invariant: sorted ascending, distinct, length <= k
    private def insert(b: Array[Long], v: Long): Array[Long] = {
      if (b.length >= k && v >= b(b.length - 1)) b
      else if (java.util.Arrays.binarySearch(b, v) >= 0) b
      else {
        val grown = b :+ v
        java.util.Arrays.sort(grown)
        if (grown.length > k) grown.take(k) else grown
      }
    }
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** aggregate column: the ≤ k smallest distinct hashes, sorted ascending */
  def kMinValues(hash: Column, k: Int = 16): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(hash)
}
