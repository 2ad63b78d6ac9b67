package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: assign documents to
  * fixed token-budget bins (context windows) by contiguous greedy
  * packing — doc d lands in bin ⌊(tokens before d)/budget⌋ within its
  * source shard, in doc_id order. Deterministic, reproducible, and the
  * standard preprocessing step between a cleaned corpus and a trainer
  * that wants ~budget-token rows.
  *
  * Scale shape: the window partitions by `source` — each shard packs
  * independently in parallel, which is also the semantics training
  * pipelines want (packs don't straddle shard boundaries). No global
  * single-partition window exists; a whole-corpus pack would be a
  * deliberate caller choice (one source value), not an engine default.
  */
object Packing {

  def greedyPack(docs: DataFrame, budget: Long = 512): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("__cb", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor(col("__cb") / budget).cast("long").as("bin"))
  }

  /** Strided document chunking — the other sequence-prep primitive (RAG
    * indexing / long-doc training): fixed `size`-token windows every
    * `stride` tokens (overlap = size − stride), the trailing chunk
    * short. Embarrassingly parallel per row, chunk count ⌈n/stride⌉, so
    * output volume is ~(size/stride)× the corpus tokens — no shuffle at
    * all; the fingerprint lets downstream exact-dedup run at chunk
    * granularity. */
  def chunk(docs: DataFrame, size: Int = 64, stride: Int = 48): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size)
    docs
      .withColumn("__t", split(lower(col("text")), " "))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__t")).cast("long"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__n"),
        posexplode(expr(
          s"""transform(sequence(0, cast(ceil(__n / $stride.0) as int) - 1),
             |  i -> md5(array_join(slice(__t, i * $stride + 1, $size), ' ')))"""
            .stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        least(lit(size.toLong), col("__n") - col("pos") * stride).as("chunk_len"),
        col("col").as("chunk_fp"))
  }
}
