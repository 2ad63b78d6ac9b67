package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.KmvSketch

/** Sketch-based corpus statistics — bounded-state estimators for numbers
  * that are exact-shuffle-sized to compute precisely at 100 TB. */
object Sketches {

  /** the KMV estimate from a sorted ≤k-minima buffer: (k−1)·2^60 divided
    * by the kth minimum (one IEEE division — bit-replayable), or the
    * buffer size when fewer than k distinct values exist. ONE definition
    * shared by the batch and streaming operators so the two gates cannot
    * drift. */
  def kmvEstimate(mins: Column, k: Int): Column =
    round(when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble * (1L << 60).toDouble) /
        element_at(mins, k)), 4)

  /** Per-source distinct-token cardinality: exact `countDistinct` next to
    * the KMV estimate ([[graft.functions.KmvSketch]]) from the same
    * md5-hash stream. At corpus scale the exact column is the expensive
    * one (distinct-set-sized shuffle) and the sketch is the survivor; both
    * are emitted here so the gate pins the estimator's exact value and the
    * bench shows its cost.
    *
    * The estimate is deterministic: hashes are the portable 60-bit md5
    * prefix, the k minima are order-independent, and the estimator is one
    * IEEE division — any engine reproduces it bit-for-bit. */
  def distinctTokenKmv(docs: DataFrame, k: Int = 16): DataFrame = {
    val h = docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .select(col("source"), Dedup.hex60(col("w")).as("h"))
    h.groupBy("source")
      .agg(countDistinct(col("h")).as("n_distinct"),
        KmvSketch.kMinValues(col("h"), k).as("__mins"))
      .select(col("source"), col("n_distinct"),
        size(col("__mins")).cast("long").as("k_used"),
        kmvEstimate(col("__mins"), k).as("kmv_est"))
  }
}
