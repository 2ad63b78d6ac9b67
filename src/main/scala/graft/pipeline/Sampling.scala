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

  /** Token-budget selection per source — "take the first B tokens of each
    * source" with B expressed as a fraction of the source's total: docs
    * are ordered by seeded hash (a deterministic shuffle of each source),
    * a running token sum accumulates in that order, and a document stays
    * iff its cumulative total still fits the budget. This is how a
    * training mix pins PER-SOURCE TOKEN counts (not doc counts) when
    * sources have wildly different document lengths.
    *
    * Determinism: ordering is (md5(seed:doc_id), doc_id) — no RNG state —
    * and the running sum is integer, so the cut point is exact; the
    * budget comparison is one IEEE multiply, identical in any engine.
    *
    * Scale shape: token counts are in-row expressions; the only shuffle
    * is the per-source window. Sources are few and may be huge — at
    * cluster scale the same construction runs per (source, shard) with
    * budget/shards per shard (hash-split each source first), keeping
    * every window partition bounded; the single-window form here is the
    * per-shard kernel of that. */
  def tokenBudgetMix(docs: DataFrame, budgetFrac: Double = 0.4,
      seed: String = "tb"): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))).as("__h"))
    val totals = base.groupBy("source").agg(sum(col("n_tokens")).as("__tot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("__h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base.join(broadcast(totals), "source")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens").cast("double") <= col("__tot").cast("double") * budgetFrac)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
  }

  /** Epoch-based source upsampling — the Llama-style mixture where
    * high-priority sources are seen MORE than once per pass: a source
    * with weight 2.5 repeats every document twice and a deterministic
    * 50% hash-selected half a third time, so the expected token count
    * scales by exactly the weight with no RNG. Output is one row per
    * (document, epoch) — the frame a sequence packer consumes.
    *
    * Scale shape: pure per-row arithmetic plus an `explode(sequence)` —
    * no shuffle at all; the expansion factor is the weight, bounded by
    * design. Weights come from a driver-side map (dimension-sized). */
  def epochUpsample(docs: DataFrame, weights: Map[String, Double] = Map(),
      defaultWeight: Double = 1.0, seed: String = "ep"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ > 0),
      "epochUpsample: weights must be positive")
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (g, v)) => when(col("source") === g, lit(v)).otherwise(acc)
    }
    // round, don't truncate: a weight like 1.7 is 1699.999… after *1000
    // and a truncating cast would select with probability 699/1000, not
    // the documented "scales by exactly the weight" 700/1000 (and would
    // diverge from the oracle's rounding CAST).
    val frac1000 = round(w * 1000).cast("long") % 1000
    val nEpochs = floor(w).cast("long") +
      when(bucket(seed, col("doc_id")) < frac1000, 1L).otherwise(0L)
    docs.select(col("doc_id"), col("source"), nEpochs.as("__n"))
      .filter(col("__n") >= 1)
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(CAST(1 AS BIGINT), __n)")).as("epoch"))
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
