package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the canonical training-data preparation
  * pipeline, composed from the engine's own operators:
  *
  *   1. quality gate      (TextAnalysis.quality: codegen'd per-row metrics)
  *   2. language gate     (TextAnalysis.langId marker scoring)
  *   3. exact dedup       (canonical = lowest doc_id per content md5)
  *   4. near-dup removal  (MinHash-LSH pairs clustered by connected
  *      components — [[ConnectedComponents.clusters]] — keeping each
  *      cluster's lowest doc_id, so transitive chains a~b~c collapse to
  *      one survivor even when (a,c) was never a candidate pair; round 3
  *      used greedy pair-drop, which could keep a non-minimal chain
  *      member whose only pair partner was larger)
  *
  * Scale shape: stages 1-2 are embarrassingly parallel column expressions;
  * stage 3 is one shuffle on the 16-byte fingerprint; stage 4 is the banded
  * LSH bucket join (no O(n²) stage) plus an O(log n)-round star contraction
  * over the PAIR set (edge-sized, not corpus-sized). The final assembly is
  * doc_id-keyed semi/anti joins — all narrow, all AQE-friendly. Nothing
  * here changes shape at 100 TB; each stage's cost is one pass + one keyed
  * shuffle.
  */
object CorpusClean {

  def clean(docs: DataFrame, minQuality: Double = 0.5, lang: String = "en",
      nearDupThreshold: Double = 0.5): DataFrame = {
    val quality = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality_score"))
    val language = TextAnalysis.langId(docs)
      .select(col("doc_id"), col("predicted"))
    val canonical = Dedup.exact(docs).filter(!col("is_dup")).select("doc_id")
    val nearDupLosers = ConnectedComponents
      .clusters(Dedup.minhashPairs(docs, numHashes = 8, bands = 4,
        threshold = nearDupThreshold))
      .filter(col("cluster_id") =!= col("doc_id")).select("doc_id")

    docs.join(quality, "doc_id")
      .join(language, "doc_id")
      .join(canonical, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .filter(col("quality_score") >= minQuality && col("predicted") === lang)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("quality_score"))
  }

  /** Quality-aware near-dup cluster REPRESENTATIVE selection — the
    * refinement over [[clean]]'s keep-lowest-id rule that production
    * dedup actually wants: within each near-duplicate cluster keep the
    * HIGHEST-QUALITY member (ties broken by lowest doc_id, so selection
    * is deterministic), flag the rest as drops. A crawl usually holds a
    * pristine copy and several boilerplate-wrapped or truncated copies of
    * the same page; min-id keeps whichever was crawled first, this keeps
    * the best one.
    *
    * Output is one row per CLUSTERED doc (`doc_id, cluster_id,
    * quality_score, keep`); unclustered docs are implicit keeps.
    * Scale shape: clusters are pair-set-sized (not corpus-sized), the
    * quality join is narrow, and the per-cluster argmax is one window
    * over cluster_id — the same partitioned-rank shape Spark pushes
    * through `InferWindowGroupLimit`. */
  def keepBest(docs: DataFrame, nearDupThreshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = ConnectedComponents
      .clusters(Dedup.minhashPairs(docs, numHashes = 8, bands = 4,
        threshold = nearDupThreshold))
    val q = TextAnalysis.quality(docs).select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    clusters.join(q, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("quality_score"), col("keep"))
  }

  /** The whole training-data preparation flow, [[clean]] extended with
    * the round-3 operators — what a 100 TB corpus actually runs before
    * a token ever reaches a trainer:
    *
    *   1-4. [[clean]]          (quality, language, exact + near dedup)
    *   5. repetition gate      (drop docs whose duplicate-bigram fraction
    *      exceeds `maxDupBigramFrac`; docs too short for bigram stats are
    *      dropped too — conservative)
    *   6. decontamination      (drop any doc sharing a 5-gram with `eval`)
    *   7. sequence packing     (survivors into `budget`-token bins per
    *      source shard)
    *
    * Every stage is the already-gated operator; the composition adds only
    * doc_id semi/anti joins — narrow, AQE-friendly, shape-stable at
    * 100 TB. */
  def pipeline(docs: DataFrame, eval: DataFrame, minQuality: Double = 0.5,
      lang: String = "en", nearDupThreshold: Double = 0.5,
      maxDupBigramFrac: Double = 0.7, budget: Long = 512): DataFrame = {
    val cleaned = clean(docs, minQuality, lang, nearDupThreshold).select("doc_id")
    val repOk = TextAnalysis.repetition(docs)
      .filter(col("dup_bigram_frac") <= maxDupBigramFrac).select("doc_id")
    val contaminated = Decontam.ngramOverlap(docs, eval)
      .filter(col("contaminated")).select("doc_id")
    val survivors = docs
      .join(cleaned, Seq("doc_id"), "left_semi")
      .join(repOk, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
    Packing.greedyPack(survivors, budget)
  }
}
