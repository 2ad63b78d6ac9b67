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
  private def subColOf(e: Column, s: Int, sd: Int): Column =
    transform(slice(e, s * sd + 1, sd), _.cast("double"))

  /** direct ordered fold of squared differences over the subspace dims —
    * NOT the norm-expansion shortcut, whose different float path would
    * break cross-engine determinism */
  private def distToC(sub: Column, c: Array[Double]): Column =
    aggregate(zip_with(sub, typedLit(c.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)

  /** index of the nearest codebook centroid for subspace `s` (6-dec
    * rounded argmin, ties to the lowest index = lowest centroid id) */
  private def bestIdxOf(books: IndexedSeq[IndexedSeq[(Long, Array[Double])]],
      e: Column, s: Int, sd: Int): Column = {
    val sub = subColOf(e, s, sd)
    val scored = books(s).zipWithIndex.map { case ((_, c), idx) =>
      struct(round(distToC(sub, c), 6).as("d"), lit(idx).as("idx"))
    }
    array_min(array(scored: _*)).getField("idx")
  }

  /** Train the per-subspace L2 codebooks: md5-sampled init refined by
    * `iters` Lloyd steps with the deterministic recipe (see [[pqEncode]]).
    * Returns m codebooks of k (cid, centroid) pairs, cid-ascending.
    * `dim` skips the probe job when the caller already knows it (<= 0
    * derives it). All m subspaces refine in ONE job per Lloyd iteration
    * (exploded (s, bucket, subvector) rows, one keyed aggregation) — the
    * per-group ordered fold is unchanged, so results are bit-identical
    * to the per-subspace form and the oracle replay still holds. */
  def pqCodebooks(emb: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 1,
      seed: Long = 7L, trainCap: Int = 100000,
      dim: Int = 0): IndexedSeq[IndexedSeq[(Long, Array[Double])]] = {
    val d = if (dim > 0) dim else emb.select(col("embedding")).head().getSeq[Float](0).length
    val sd = d / m
    require(sd * m == d, s"dim $d not divisible into $m subspaces")

    // the k-row init sample is the PREFIX of the same md5-ranked order the
    // training sample uses (k <= trainCap), so it reads through the cached
    // train frame — one sort job materializes both
    val train = emb.select(col("vec_id"), col("embedding"))
      .withColumn("__k", md5(concat(lit(s"$seed:"), col("vec_id"))))
      .orderBy("__k").limit(trainCap).cache()
    try {
      val sampleRows = train.limit(k).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1).toIndexedSeq
      var books: IndexedSeq[IndexedSeq[(Long, Array[Double])]] =
        (0 until m).map(s => sampleRows.map { case (cid, v) =>
          (cid, v.slice(s * sd, (s + 1) * sd)) })
      for (_ <- 0 until iters) {
        val subStructs = (0 until m).map { s =>
          struct(lit(s).as("s"), bestIdxOf(books, col("embedding"), s, sd).as("b"),
            subColOf(col("embedding"), s, sd).as("sub"))
        }
        val means = train
          .select(col("vec_id"), explode(array(subStructs: _*)).as("x"))
          .select(col("vec_id"), col("x.s").as("s"), col("x.b").as("b"),
            col("x.sub").as("sub"))
          .groupBy("s", "b")
          .agg(count(lit(1)).as("cnt"),
            sort_array(collect_list(struct(col("vec_id"), col("sub")))).as("vs"))
          .select(col("s"), col("b"), expr(
            s"transform(sequence(0, ${sd - 1}), d -> " +
              "aggregate(vs, cast(0 as double), (acc, v) -> acc + v.sub[d]) / cnt)").as("mean"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
          .toMap
        books = books.zipWithIndex.map { case (book, s) =>
          book.zipWithIndex.map { case ((cid, old), idx) =>
            (cid, means.getOrElse((s, idx), old)) }
        }
      }
      books
    } finally { train.unpersist(); () }
  }

  def pqEncode(emb: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 1,
      seed: Long = 7L, trainCap: Int = 100000): DataFrame = {
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).length
    val sd = dim / m
    val books = pqCodebooks(emb, m, k, iters, seed, trainCap, dim)

    val coded = (0 until m).foldLeft(emb.select(col("vec_id"), col("embedding"))) {
      (df, s) => df.withColumn(s"__c$s", bestIdxOf(books, col("embedding"), s, sd))
    }
    // per-subspace squared error of the CHOSEN centroid (unrounded),
    // summed left-associatively — the same float path as the oracle
    val totalErr = (0 until m).map { s =>
      element_at(array(books(s).map { case (_, c) =>
        distToC(subColOf(col("embedding"), s, sd), c) }: _*),
        col(s"__c$s") + 1)
    }.reduce(_ + _)
    coded.select(col("vec_id"),
      concat_ws(",", (0 until m).map(s => col(s"__c$s").cast("string")): _*).as("code"),
      round(sqrt(totalErr / lit(dim * 1.0)), 6).as("recon_rmse"))
  }

  /** The per-query ADC distance tables, MATERIALIZED as m array columns
    * on the (tiny) query frame: `__dt_s[c] = ‖q_sub_s − centroid_c‖²`.
    * This is the half of ADC that must happen once per QUERY, not once
    * per (query, vector) pair — Catalyst does not hoist query-dependent
    * subexpressions out of a join, so leaving the table as an expression
    * over `q_emb` inside the join re-runs m·k·sd multiply-adds per pair
    * (the round-3 bench showed that costing 14× the exact brute force). */
  private def withQueryDistTables(queries: DataFrame,
      books: IndexedSeq[IndexedSeq[(Long, Array[Double])]], m: Int, sd: Int): DataFrame =
    (0 until m).foldLeft(queries) { (df, s) =>
      df.withColumn(s"__dt$s", array(books(s).map { case (_, c) =>
        distToC(subColOf(col("q_emb"), s, sd), c) }: _*))
    }.drop("q_emb")

  /** per-pair approximate distance: m table lookups + adds, nothing else */
  private def adcDistExpr(m: Int): Column =
    (0 until m).map(s => element_at(col(s"__dt$s"), col(s"__c$s") + 1)).reduce(_ + _)

  /** ADC (asymmetric distance computation) top-k — the search half of a
    * PQ index: queries stay exact, the corpus is its PQ codes, and the
    * approximate distance is the sum of per-subspace distances from the
    * query's subvector to the CODED centroid. Per (query, vector) pair
    * that's m table lookups instead of a dim-wide dot product — the
    * compute shape that makes billion-scale search affordable; a
    * production index composes this kernel with IVF bucketing —
    * [[ivfAdcTopK]], the FAISS IVFADC composition.
    *
    * The m per-query distance tables are computed ONCE per query as
    * array columns on the broadcast side ([[withQueryDistTables]]); the
    * joined expression is just `element_at` lookups. The corpus side
    * streams through one pass over its codes, and the top-k window
    * prunes map-side via InferWindowGroupLimit — same plan shape as the
    * exact searches. */
  def adcTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5, m: Int = 4,
      kc: Int = 8, iters: Int = 1, seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).length
    val sd = dim / m
    val books = pqCodebooks(emb, m, kc, iters, seed, dim = dim)

    val coded = (0 until m).foldLeft(emb.select(col("vec_id"), col("embedding"))) {
      (df, s) => df.withColumn(s"__c$s", bestIdxOf(books, col("embedding"), s, sd))
    }.drop("embedding")
    val queries = withQueryDistTables(
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      books, m, sd)

    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("ad"), 6).asc, col("vec_id"))
    coded.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("ad", adcDistExpr(m))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("ad"), 4).as("adist"), col("rk").cast("long").as("rk"))
  }

  /** IVFADC — the production composition the two index halves exist for
    * (FAISS's standard billion-scale recipe): IVF bucketing cuts the
    * CANDIDATE COUNT (each query scans only its nProbe closest k-means
    * buckets), PQ+ADC cuts the PER-CANDIDATE COST (m table lookups
    * instead of a dim-wide distance).
    *
    * Plan shape: centroids and codebooks are plan-time literals trained
    * on bounded samples; the corpus is one pass (assign bucket + encode
    * codes, embedding dropped); the probe side is a tiny broadcast of
    * (query_id, bucket, m distance-table arrays); the candidate join is
    * a BUCKET-KEY equi-join — no full corpus scan per query, no
    * embeddings through the join, top-k prunes map-side via
    * InferWindowGroupLimit. */
  def ivfAdcTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      nCentroids: Int = 16, nProbe: Int = 4, ivfIters: Int = 2,
      m: Int = 4, kc: Int = 8, pqIters: Int = 1, seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).length
    val sd = dim / m
    val books = pqCodebooks(emb, m, kc, pqIters, seed, dim = dim)
    val cents = Similarity.kmeansCentroids(emb, nCentroids, ivfIters, seed, dim = dim)

    val withNorm = emb.withColumn("norm", Similarity.norm(col("embedding")))
    val coded = (0 until m).foldLeft(
      withNorm.withColumn("bucket", Similarity.bestCentroidExpr(cents))) { (df, s) =>
      df.withColumn(s"__c$s", bestIdxOf(books, col("embedding"), s, sd))
    }.select(col("vec_id") +: col("bucket") +:
      (0 until m).map(s => col(s"__c$s")): _*)

    val queries = withNorm.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"))
    val probes = withQueryDistTables(
      Similarity.probeBuckets(queries, cents, nProbe).drop("q_norm"),
      books, m, sd)

    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("ad"), 6).asc, col("vec_id"))
    coded.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("ad", adcDistExpr(m))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("ad"), 4).as("adist"), col("rk").cast("long").as("rk"))
  }

  /** Two-stage retrieval — IVFADC shortlist, EXACT re-rank: the standard
    * production recipe for recovering quantization-distorted ranks.
    * Stage 1 ([[ivfAdcTopK]] at `kShort`) pays m table lookups per
    * candidate over probed buckets only; stage 2 fetches the ORIGINAL
    * vectors for the kShort survivors per query and re-scores them with
    * the exact codegen'd cosine, ranking the final top-k. The exact pass
    * touches kShort·nQueries vectors — per-query constant, independent of
    * corpus size — so the expensive full-precision arithmetic runs on a
    * vanishing fraction of the corpus while recall recovers toward the
    * probe ceiling (ADC distortion can only reorder WITHIN the
    * shortlist; re-ranking fixes exactly that error class).
    * Shortlist is broadcast-sized; the vector fetch is one semi-join-
    * shaped equi-join on vec_id — embeddings cross no shuffle wider than
    * the survivors themselves. */
  def ivfAdcRerankTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      kShort: Int = 20, nCentroids: Int = 16, nProbe: Int = 4,
      ivfIters: Int = 2, m: Int = 4, kc: Int = 8, pqIters: Int = 1,
      seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DotProductExpr.dotProduct
    val shortlist = ivfAdcTopK(emb, nQueries, kShort, nCentroids, nProbe,
      ivfIters, m, kc, pqIters, seed)
      .select(col("query_id"), col("neighbor_id"))
    val withNorm = emb.withColumn("norm", Similarity.norm(col("embedding")))
    val queries = withNorm.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("sim"), 6).desc, col("neighbor_id"))
    shortlist
      .join(withNorm.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"), col("norm").as("n_norm")), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("sim",
        dotProduct(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"), col("rk").cast("long").as("rk"))
  }

  /** Asymmetric int8-SQ search: RAW queries scored against the
    * DEQUANTIZED [[quantizeInt8]] corpus — the standard scalar-quantized
    * serving path (4× memory cut, queries stay full-precision so only
    * the corpus side pays distortion). Complements the PQ/ADC family:
    * SQ8 is the cheap high-recall compression, PQ the aggressive one;
    * `pipe_sim_recall_sq8` vs `pipe_sim_recall_ivfadc` measures that
    * trade directly.
    *
    * Determinism: dequantization replays the exact quantizer arithmetic
    * (floor(x·127/scale + 0.5)·scale/127 — floor is engine-exact), all
    * dots/norms are ascending ordered folds, ranks tie to the id. */
  def sq8TopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = transform(col("embedding"), (x: Column) => x.cast("double"))
    val scale = array_max(transform(e, (x: Column) => abs(x)))
    val sqNorm = (c: Column) =>
      sqrt(aggregate(transform(c, (x: Column) => x * x), lit(0.0), _ + _))
    val corpus = emb.withColumn("__e", e).withColumn("__s", scale)
      .withColumn("__d",
        when(col("__s") === 0d, transform(col("__e"), (_: Column) => lit(0.0)))
          .otherwise(transform(col("__e"), (x: Column) =>
            floor((x * lit(127.0)) / col("__s") + lit(0.5)) * col("__s") / lit(127.0))))
      .select(col("vec_id"), col("__d"), sqNorm(col("__d")).as("dnorm"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .withColumn("__e", e)
      .select(col("vec_id").as("query_id"), col("__e").as("q_emb"),
        sqNorm(col("__e")).as("q_norm"))
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        aggregate(zip_with(col("q_emb"), col("__d"), (a, b) => a * b),
          lit(0.0), _ + _) / (col("dnorm") * col("q_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("sim"), 6).desc, col("vec_id"))
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("sim"), 4).as("sim"), col("rk").cast("long").as("rk"))
  }
}
