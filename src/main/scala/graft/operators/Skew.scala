package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); salting is the
  * deterministic fallback when a key is so hot that even split partitions
  * overwhelm one executor — e.g. a dataset containing most of the catalog
  * joined on `dataset_name`, or an ultra-frequent shingle in the dedup
  * inverted index.
  */
object Skew {

  /** inner equi-join with the big side salted into `nSalts` streams and
    * the small side replicated `nSalts`× — same rows as a plain inner
    * join, but the hot key's work spreads over `nSalts` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int = 16): DataFrame = {
    require(nSalts > 0)
    // salt is arbitrary per-row; spreading, not semantics
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
