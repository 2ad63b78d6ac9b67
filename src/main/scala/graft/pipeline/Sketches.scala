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

  /** Count-min sketch of the token frequency stream, queried for the
    * corpus's true heavy hitters: the grid holds d×w counters (fixed
    * memory regardless of vocabulary size — the point of the sketch at
    * 100 TB, where the exact term-count table is vocabulary-sized), each
    * token increments one cell per row via the portable 60-bit md5 hash,
    * and a term's estimate is the MINIMUM of its d cells — ≥ the true
    * count always (cells only ever over-count via collisions), and
    * within εN with probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉.
    *
    * Emitted per top-k true term: exact count, CM estimate, rank — the
    * gate pins the sketch bit-for-bit (hashes and integer sums are
    * engine-exact) and the spec pins the never-underestimates property.
    * Scale shape: the grid is one d·w-bounded aggregation with map-side
    * combine; the exact column is the expensive vocabulary-sized shuffle
    * the sketch exists to replace — both emitted so the gate can compare
    * them. */
  def countMinHeavyHitters(docs: DataFrame, d: Int = 4, w: Int = 1024,
      k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(explode(split(lower(col("text")), " ")).as("term"))
    def cellOf(j: Int, t: Column): Column = Dedup.hex60(concat(lit(s"$j:"), t)) % w
    val grid = (0 until d).map(j =>
      toks.select(lit(j).as("j"), cellOf(j, col("term")).as("cell")))
      .reduce(_ unionByName _)
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
    val top = toks.groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("term")).limit(k)
      // window over the k survivors only, as in TextAnalysis.topNgrams
      .withColumn("rk", row_number().over(
        Window.orderBy(col("true_cnt").desc, col("term"))).cast("long"))
    val probes = (0 until d).map(j =>
      top.select(col("term"), lit(j).as("j"), cellOf(j, col("term")).as("cell")))
      .reduce(_ unionByName _)
    probes.join(grid, Seq("j", "cell"))
      .groupBy("term").agg(min(col("cnt")).as("cm_est"))
      .join(top, Seq("term"))
      .select(col("term"), col("true_cnt"), col("cm_est"), col("rk"))
  }

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

  /** Pairwise cross-source vocabulary overlap from KMV sketches alone —
    * the theta-sketch-style set algebra: the union sketch of (A, B) is
    * the k smallest of the merged minima, the Jaccard estimate is the
    * fraction of the union sketch present in BOTH input sketches, and
    * the intersection estimate is jaccard × union. This answers "how
    * much do two corpora share" over every pair WITHOUT ever holding a
    * distinct set — the exact answer is a distinct-set-sized shuffle per
    * pair, the sketch answer is k longs per source and a dimension-sized
    * cross join.
    *
    * Deterministic end-to-end: portable md5 hashes, order-independent
    * minima, integer membership counts, one IEEE multiply/divide chain —
    * the gate replays the whole algebra in DuckDB bit-for-bit. */
  def kmvOverlap(docs: DataFrame, k: Int = 16): DataFrame = {
    val sk = docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .select(col("source"), Dedup.hex60(col("w")).as("h"))
      .groupBy("source").agg(KmvSketch.kMinValues(col("h"), k).as("mins"))
    val a = sk.select(col("source").as("src_a"), col("mins").as("mins_a"))
    val b = sk.select(col("source").as("src_b"), col("mins").as("mins_b"))
    val mu = slice(array_sort(array_union(col("mins_a"), col("mins_b"))), 1, k)
    a.crossJoin(b).filter(col("src_a") < col("src_b"))
      .withColumn("__mu", mu)
      .withColumn("__ku", size(col("__mu")))
      .withColumn("__ic",
        size(array_intersect(col("__mu"), array_intersect(col("mins_a"), col("mins_b")))))
      .withColumn("__eu",
        when(col("__ku") < k, col("__ku").cast("double"))
          .otherwise(lit((k - 1).toDouble * (1L << 60).toDouble) /
            element_at(col("__mu"), k)))
      .select(col("src_a"), col("src_b"), col("__ku").cast("long").as("k_used"),
        round(col("__eu"), 4).as("est_union"),
        round(col("__ic").cast("double") / col("__ku"), 4).as("est_jaccard"),
        round(col("__ic").cast("double") / col("__ku") * col("__eu"), 4).as("est_intersect"))
  }
}
