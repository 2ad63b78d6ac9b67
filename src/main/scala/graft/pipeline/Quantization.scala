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

  /** Product quantization — the other half of the FAISS-style index
    * family next to IVF ([[Similarity.kmeansCentroids]]): split each
    * vector into `m` subspaces, train a k-centroid L2 codebook per
    * subspace (Lloyd steps over the md5-sampled init, exactly the
    * deterministic recipe of the IVF trainer: 6-decimal-rounded argmin
    * with ties to the lowest centroid id, bucket means folded in
    * ascending vec_id order, empty buckets keep their position), then
    * encode every vector as `m` code indices — a dim×4-byte float vector
    * becomes m bytes. Emits the codes plus the L2 reconstruction RMSE
    * that tells you whether the index can use them.
    *
    * Distances are computed as the direct ordered fold of
    * (x_i − c_i)² — NOT the ‖x‖²−2x·c+‖c‖² shortcut, whose different
    * float path would break cross-engine determinism — so the DuckDB
    * oracle replays training and encoding bit-for-bit.
    *
    * Scale: training folds `trainCap` sampled vectors (sample-train,
    * encode-distributed); encoding is one embarrassingly-parallel pass —
    * m·k distance expressions per row, no shuffle, no join. */
  def pqEncode(emb: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 1,
      seed: Long = 7L, trainCap: Int = 100000): DataFrame = {
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).length
    val sd = dim / m
    require(sd * m == dim, s"dim $dim not divisible into $m subspaces")

    def subCol(s: Int): Column =
      transform(slice(col("embedding"), s * sd + 1, sd), _.cast("double"))
    // direct ordered fold of squared differences over the subspace dims
    def distTo(sub: Column, c: Array[Double]): Column =
      aggregate(zip_with(sub, typedLit(c.toSeq), (x, y) => (x - y) * (x - y)),
        lit(0.0), _ + _)

    val sampleRows = emb.select(col("vec_id"), col("embedding"))
      .withColumn("__k", md5(concat(lit(s"$seed:"), col("vec_id"))))
      .orderBy("__k").limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).toIndexedSeq
    var books: IndexedSeq[IndexedSeq[(Long, Array[Double])]] =
      (0 until m).map(s => sampleRows.map { case (cid, v) =>
        (cid, v.slice(s * sd, (s + 1) * sd)) })

    def bestIdx(s: Int): Column = {
      val sub = subCol(s)
      val scored = books(s).zipWithIndex.map { case ((_, c), idx) =>
        struct(round(distTo(sub, c), 6).as("d"), lit(idx).as("idx"))
      }
      array_min(array(scored: _*)).getField("idx")
    }

    val train = emb.select(col("vec_id"), col("embedding"))
      .withColumn("__k", md5(concat(lit(s"$seed:"), col("vec_id"))))
      .orderBy("__k").limit(trainCap).drop("__k").cache()
    try {
      for (_ <- 0 until iters; s <- 0 until m) {
        val means = train
          .withColumn("sub", subCol(s))
          .withColumn("b", bestIdx(s))
          .groupBy("b")
          .agg(count(lit(1)).as("cnt"),
            sort_array(collect_list(struct(col("vec_id"), col("sub")))).as("vs"))
          .select(col("b"), expr(
            s"transform(sequence(0, ${sd - 1}), d -> " +
              "aggregate(vs, cast(0 as double), (acc, v) -> acc + v.sub[d]) / cnt)").as("mean"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
          .toMap
        books = books.updated(s, books(s).zipWithIndex.map { case ((cid, old), idx) =>
          (cid, means.getOrElse(idx, old))
        })
      }
    } finally { train.unpersist(); () }

    val coded = (0 until m).foldLeft(emb.select(col("vec_id"), col("embedding"))) {
      (df, s) => df.withColumn(s"__c$s", bestIdx(s))
    }
    // per-subspace squared error of the CHOSEN centroid (unrounded),
    // summed left-associatively — the same float path as the oracle
    val totalErr = (0 until m).map { s =>
      element_at(array(books(s).map { case (_, c) => distTo(subCol(s), c) }: _*),
        col(s"__c$s") + 1)
    }.reduce(_ + _)
    coded.select(col("vec_id"),
      concat_ws(",", (0 until m).map(s => col(s"__c$s").cast("string")): _*).as("code"),
      round(sqrt(totalErr / lit(dim * 1.0)), 6).as("recon_rmse"))
  }
}
