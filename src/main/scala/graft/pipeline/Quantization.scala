package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression for large-scale vector stores: per-vector int8
  * scalar quantization (the standard 4× shrink before ANN indexing) plus
  * the reconstruction error that tells you whether the index can use it.
  *
  * All pure column expressions — one embarrassingly-parallel pass, no
  * shuffle, codegen'd end to end. Rounding is expressed as
  * `floor(x + 0.5)` (round-half-up) rather than `round()` because engines
  * disagree on half-even vs half-away ties; every arithmetic step is
  * parenthesized to pin evaluation order so any engine reproduces the
  * quantized codes bit-for-bit. */
object Quantization {

  /** max-abs scalar quantization to int8 codes:
    * scale = max|x_i|, q_i = floor((x_i * 127) / scale + 0.5) ∈ [-127,127];
    * zero vectors quantize to all-zero codes. Emits codes as a joined
    * string (stable cross-engine compare) and the per-vector RMSE of the
    * dequantized reconstruction. */
  def quantizeInt8(emb: DataFrame, dim: Int = 64): DataFrame = {
    val e = transform(col("embedding"), _.cast("double"))
    val scale = array_max(transform(e, abs(_)))
    def qOf(x: Column): Column =
      when(col("scale") === 0d, lit(0L))
        .otherwise(floor((x * lit(127.0)) / col("scale") + lit(0.5)).cast("long"))
    emb
      .withColumn("__e", e)
      .withColumn("scale", scale)
      .withColumn("__q", transform(col("__e"), qOf(_)))
      .withColumn("__sq",
        zip_with(col("__e"), col("__q"),
          (a, q) => { val d = a - (q.cast("double") * col("scale")) / lit(127.0); d * d }))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale"),
        concat_ws(",", transform(col("__q"), _.cast("string"))).as("q"),
        round(sqrt(aggregate(col("__sq"), lit(0.0), _ + _) / lit(dim * 1.0)), 6)
          .as("rmse"))
  }
}
