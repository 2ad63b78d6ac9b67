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
  /** Balanced output-shard assignment: distribute documents over
    * `numShards` writers so per-shard WEIGHT (token/char counts) comes
    * out near-equal — what a shard writer needs before materializing a
    * training corpus, where hash-partitioning balances row COUNTS but a
    * heavy-tailed length distribution still skews bytes per shard.
    *
    * Boustrophedon (snake) assignment over the global weight-descending
    * order: row r goes to shard `r % n` on even passes and `n-1-(r % n)`
    * on odd ones, so each shard alternates picking early (heavy) and late
    * (light) rows — the classic greedy-balance approximation, fully
    * deterministic (weight ties break by doc_id).
    *
    * Scale shape: the global rank is computed DISTRIBUTEDLY — a
    * range-partitioned sort of the NARROW (doc_id, weight) projection
    * plus per-partition offsets via `zipWithIndex` (one lightweight
    * count job), the same technique as the MQL sample/stride filters —
    * never a single-task global window, and the text column never moves.
    * At 1000 executors this is terasort-shaped: range exchange of narrow
    * rows, no driver bottleneck. */
  def shardAssign(docs: DataFrame, numShards: Int = 8,
      weightCol: String = "n_chars"): DataFrame = {
    require(numShards > 0, "shardAssign: numShards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val n = numShards.toLong
    val sorted = docs
      .select(col("doc_id").cast("long"), col(weightCol).cast("long").as("weight"))
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("weight").desc, col("doc_id"))
      .sortWithinPartitions(col("weight").desc, col("doc_id"))
    // range partitions are globally ordered, so zipWithIndex's
    // partition-sequential index IS the global weight-descending rank
    sorted.as[(Long, Long)].rdd.zipWithIndex()
      .map { case ((id, wt), r) =>
        val pos = r % n
        val shard = if ((r / n) % 2 == 0) pos else n - 1 - pos
        (id, wt, shard)
      }
      .toDF("doc_id", "weight", "shard")
  }

  /** Materialize the [[shardAssign]] layout: write the full documents
    * into `outDir` partitioned by shard (`shard=N/` directories, the
    * layout a trainer's data loader consumes), then return the read-back
    * per-shard summary — proving the round trip, not just the plan.
    * The text joins the narrow assignment by doc_id once, at write time. */
  def writeShards(docs: DataFrame, outDir: String, numShards: Int = 8,
      weightCol: String = "n_chars"): DataFrame = {
    val assigned = shardAssign(docs, numShards, weightCol)
      .select(col("doc_id"), col("shard"))
    docs.join(assigned, Seq("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol).cast("long")).as("total_weight"))
      .select(col("shard").cast("long").as("shard"), col("n_docs"),
        col("total_weight"))
  }

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

  /** Z-order (Morton) layout assignment over two query dimensions — the
    * Delta `OPTIMIZE ZORDER BY` posture: interleave the bit patterns of
    * the per-dimension buckets so rows close in BOTH dimensions land in
    * the same file group, giving min/max file-skipping on either
    * predicate axis (a single-column sort prunes only its own axis).
    *
    * Buckets are VALUE-derived (fixed-width ranges / a fixed category
    * map), not rank-derived — no global sort or ntile window, so the
    * pass is a pure per-row expression and new data buckets identically
    * (the same growth-stability argument as [[Sampling.splitAssign]]).
    * At cluster scale the emitted `file_group` feeds
    * `repartitionByRange(file_group)` + per-group writes; here it is the
    * assignment itself, engine-replayable bit-for-bit. */
  def zorderLayout(docs: DataFrame, lenBits: Int = 8,
      groupShift: Int = 12): DataFrame = {
    // dimension 1: length bucket (64-char ranges, capped to 8 bits);
    // dimension 2: language category id spread across the 8-bit range so
    // interleaving has high-order bits to work with
    val bx = least(lit((1 << lenBits) - 1), floor(col("n_chars") / 64)).cast("long")
    val langIdx = when(col("lang") === "de", 0L).when(col("lang") === "en", 1L)
      .when(col("lang") === "es", 2L).when(col("lang") === "fr", 3L)
      .when(col("lang") === "zh", 4L).otherwise(5L)
    val by = langIdx * 42L
    val zval = (0 until lenBits).map { i =>
      (shiftleft(shiftright(bx, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(by, i).bitwiseAND(1L), 2 * i + 1)).cast("long")
    }.reduce(_ + _)
    docs.select(col("doc_id"), col("lang"), col("n_chars"),
      bx.as("len_bucket"), by.as("lang_bucket"), zval.as("zval"),
      shiftright(zval, groupShift).cast("long").as("file_group"))
  }
}
