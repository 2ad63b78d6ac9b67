package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic Bloom filter over strings, built as a distributed
  * aggregate and probed from executors via a broadcast bitset.
  *
  * Every hash is the portable 60-bit md5 prefix of `"j:" + value` (the
  * same hex60 the rest of the engine uses), so the filter's exact bit
  * pattern — including its false positives — is reproducible by any
  * engine. No false negatives ever: a value inserted sets all `numHash`
  * of its bits, and the OR-merge is monotone.
  *
  * Scale purpose: a membership pre-filter whose broadcast size is the
  * BITSET (bits/8 bytes — 2 MiB at 2^24 bits), independent of the member
  * set's size. When the member set itself is too large to broadcast as a
  * hash set, probe the Bloom first and exact-confirm only the survivors
  * through a (shuffled) join — see `Decontam.ngramOverlapBloom`.
  */
object BloomSketch {

  /** OR-merge aggregator over pre-computed bit positions; the buffer is a
    * fixed `bits/64`-long array regardless of input size. */
  class BloomAgg(bits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(bits > 0 && bits % 64 == 0)
    def zero: Array[Long] = new Array[Long](bits / 64)
    def reduce(b: Array[Long], pos: Long): Array[Long] = {
      b((pos / 64).toInt) |= (1L << (pos % 64).toInt); b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** aggregate column: the OR of all single-bit positions in `pos` */
  def bitsetAgg(pos: Column, bits: Int): Column =
    udaf(new BloomAgg(bits), Encoders.scalaLong).apply(pos)

  /** JVM-side twin of `Dedup.hex60` (first 15 md5 hex digits as a long) —
    * probe-side hashing must match the Column-side build bit-for-bit */
  def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    // 15 hex digits = first 7.5 bytes, big-endian
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** bit position of hash function `j` for `value` */
  def position(j: Int, value: String, bits: Int): Long =
    hex60(s"$j:$value") % bits

  /** driver-side membership probe against a collected bitset */
  def mightContain(bitset: Array[Long], value: String, bits: Int, numHash: Int): Boolean = {
    var j = 0
    while (j < numHash) {
      val p = position(j, value, bits)
      if ((bitset((p / 64).toInt) >>> (p % 64).toInt & 1L) == 0L) return false
      j += 1
    }
    true
  }
}
