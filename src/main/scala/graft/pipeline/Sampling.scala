package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-mix construction: each
  * document is kept iff its seeded content hash falls under its group's
  * rate — a pure per-row predicate, so the mix is reproducible across
  * runs/engines, stable under repartitioning, and composes with pushdown
  * (no RNG state, no `sample()` nondeterminism). This is how production
  * pipelines pin "90% en, 40% other, 20% zh"-style mixture weights. */
object Sampling {

  /** hash-bucket in [0, 1000): first 6 md5 hex digits of "seed:doc_id" */
  def bucket(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), id.cast("string"))), 1, 6), 16, 10)
      .cast("long") % 1000

  /** stratified sample: keep a document iff bucket < rate(group)*1000;
    * groups absent from `rates` fall back to `defaultRate`. */
  def stratified(docs: DataFrame, groupCol: String, rates: Map[String, Double],
      defaultRate: Double = 0.0, seed: String = "mix"): DataFrame = {
    val keepBelow = rates.foldLeft(lit((defaultRate * 1000).toLong)) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit((r * 1000).toLong)).otherwise(acc)
    }
    docs.filter(bucket(seed, col("doc_id")) < keepBelow)
  }

  /** Deterministic train/val/test assignment by seeded content hash — the
    * split every training pipeline needs pinned: a document's subset
    * depends ONLY on (seed, doc_id), so it is reproducible across runs and
    * engines, stable under repartitioning, and — the property random
    * splits lack — STABLE UNDER CORPUS GROWTH: ingesting new documents
    * never reassigns an existing one, so eval sets stay uncontaminated as
    * the corpus accretes. Pure per-row predicate; no shuffle, no RNG
    * state, composes with pushdown. */
  def splitAssign(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5,
      seed: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "splitAssign: train+val must be <= 100")
    val b = bucket(seed, col("doc_id")) % 100
    docs.select(col("doc_id"), b.as("bucket"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }
}
