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

  /** Deterministic weighted sample WITHOUT replacement, k per group —
    * Efraimidis-Spirakis A-ES: each row draws u ∈ (0,1] and ranks by
    * u^(1/w); the k largest win, giving every row inclusion probability
    * proportional to its weight with a SINGLE pass and a bounded top-k —
    * the distributed-reservoir construction (importance-weighted corpus
    * sampling: weight by length, quality, domain priority…).
    *
    * Determinism: u derives from md5 (u = (hex60+1)/2^60), and ranking
    * uses the monotone-equivalent score ln(u)/w = (ln(m+1) − 60·ln 2)/w
    * — logs over INTEGER arguments only (the engine-exact discipline),
    * 6-dec-rounded with doc_id tie-break. Larger score = larger u^(1/w).
    *
    * Scale shape: per-row key computation is codegen'd; the per-group
    * top-k is the partial-WindowGroupLimit shape (k rows per partition
    * survive the shuffle). Weights must be positive integers. */
  def weightedSample(docs: DataFrame, k: Int = 5, weightCol: String = "n_chars",
      groupCol: String = "source", seed: String = "ws"): DataFrame = {
    val m = conv(substring(md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val score = round(
      (log(m + lit(1).cast("double")) - lit(60.0) * log(lit(2.0))) /
        col(weightCol).cast("double"), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(score.desc, col("doc_id"))
    docs.withColumn("__s", score)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("doc_id"), col(weightCol), col("rk"))
  }

  /** Temperature-based group re-balancing — the multilingual α-sampling of
    * XLM/mC4: with group shares p_g, the target distribution is
    * q_g ∝ p_g^α, flattening head groups and boosting tail ones as α→0
    * (α=1 keeps natural proportions). Realized as per-group Bernoulli
    * DOWN-sampling: keep-rate r_g = (n_min/n_g)^(1−α), so the smallest
    * group keeps everything and each group's expected surviving count is
    * proportional to n_g^α — no upsampling, single corpus pass.
    *
    * Deterministic end-to-end: membership is the same seeded md5 bucket
    * rule as [[stratified]], and for the default α=0.5 the rate is an
    * IEEE-exact `sqrt` of a count ratio, so thresholds are bit-identical
    * across engines (the gate's oracle recomputes them in DuckDB).
    *
    * Scale shape: one dimension-sized groupBy-count collected to the
    * driver (bounded: languages/sources, not rows), then a pure per-row
    * codegen'd predicate — no shuffle of the corpus itself. */
  def temperatureMix(docs: DataFrame, groupCol: String = "lang",
      alpha: Double = 0.5, seed: String = "temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperatureMix: alpha in (0,1], got $alpha")
    val counts = docs.groupBy(groupCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    require(counts.nonEmpty, "temperatureMix: empty corpus")
    val nMin = counts.map(_._2).min
    val thresholds = counts.map { case (g, n) =>
      val ratio = nMin.toDouble / n
      // sqrt is correctly-rounded IEEE — bit-identical in every engine;
      // pow is only 1-ulp-accurate, fine for the API, avoided at α=0.5
      val rate = if (alpha == 0.5) math.sqrt(ratio) else math.pow(ratio, 1 - alpha)
      g -> (rate * 1000).toLong
    }
    val keepBelow = thresholds.foldLeft(lit(0L)) {
      case (acc, (g, t)) => when(col(groupCol) === g, lit(t)).otherwise(acc)
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
