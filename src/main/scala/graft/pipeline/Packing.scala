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
}
