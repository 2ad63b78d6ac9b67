package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose token
  * n-grams collide with an evaluation/benchmark set — the standard
  * train/test-overlap filter of large-corpus pipelines (the GPT-3
  * appendix-C / PaLM style: any exact n-gram collision contaminates;
  * we also report the collision FRACTION so callers can choose a
  * softer threshold).
  *
  * Scale shape (the part that matters at 100 TB): benchmark sets are
  * tiny and bounded (MBs) while the train side is the corpus, so the
  * eval n-gram set is distinct-ed and BROADCAST — the train side is
  * one projection + explode, one broadcast hash join (no shuffle of
  * text), and one per-doc aggregation with map-side partial combine.
  * The corpus is scanned exactly once; nothing wide crosses a shuffle
  * except (doc_id, n, hit) rows.
  */
object Decontam {

  /** distinct word n-grams per doc; docs shorter than n tokens are out
    * of scope (they cannot contain an n-gram). Stateless projection —
    * also safe on a streaming DataFrame (see
    * [[graft.streaming.DecontamStream]]). */
  private[graft] def ngrams(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("__t", split(lower(col("text")), " "))
      .filter(size(col("__t")) >= n)
      .withColumn("g", array_distinct(expr(
        s"transform(sequence(0, size(__t) - $n), i -> concat_ws(' ', slice(__t, i + 1, $n)))")))
      .select(col("doc_id"), col("g"))

  /** Per-train-doc contamination against `eval`: distinct-n-gram count,
    * how many of them occur anywhere in the eval set, the fraction, and
    * the any-collision flag. */
  def ngramOverlap(train: DataFrame, eval: DataFrame, n: Int = 5): DataFrame = {
    val evalNg = ngrams(eval, n)
      .select(explode(col("g")).as("ng")).distinct()
      .withColumn("__hit", lit(1))
    ngrams(train, n)
      .select(col("doc_id"), size(col("g")).as("__n"), explode(col("g")).as("ng"))
      .join(broadcast(evalNg), Seq("ng"), "left")
      .groupBy("doc_id")
      .agg(first(col("__n")).cast("long").as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0))).as("hits"))
      .withColumn("contam_frac", round(col("hits").cast("double") / col("n_ngrams"), 4))
      .withColumn("contaminated", col("hits") > 0)
  }

  /** FUZZY decontamination: flag training documents NEAR-DUPLICATE to any
    * eval document, not just sharing an exact n-gram — the complement of
    * [[ngramOverlap]] for paraphrased/lightly-edited benchmark leakage
    * (exact n-gram filters miss a reworded eval question; doc-level
    * MinHash similarity catches it).
    *
    * Machinery is cross-corpus MinHash-LSH: band both corpora's
    * signatures ([[Dedup.bandedKeys]]), bucket-join train bands against
    * the BROADCAST eval bands, then exact-verify each candidate's shingle
    * Jaccard >= `threshold`. Per train doc: how many eval docs it
    * near-matches, the best verified Jaccard, and the contaminated flag.
    * Deterministic, and like every LSH path: banding can miss borderline
    * pairs (recall 1-(1-j^r)^b) but never invents one — every reported
    * match carries its exact verified score.
    *
    * Scale shape: the eval corpus is tiny and bounded, so BOTH its banded
    * keys and its shingle sets broadcast; the train side contributes only
    * (doc_id, band, bkey) rows to the candidate join and shingle arrays
    * for candidate docs only to the verify join. Nothing quadratic,
    * nothing wide shuffles. */
  def fuzzyOverlap(train: DataFrame, eval: DataFrame, numHashes: Int = 8,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val shT = Dedup.withShingles(train).select(col("doc_id"), col("shingles"))
    val shE = Dedup.withShingles(eval).select(col("doc_id"), col("shingles"))
    val cand = Dedup.bandedKeys(shT, numHashes, bands)
      .select(col("band"), col("bkey"), col("doc_id").as("tid"))
      .join(broadcast(Dedup.bandedKeys(shE, numHashes, bands)
        .select(col("band"), col("bkey"), col("doc_id").as("eid"))),
        Seq("band", "bkey"))
      .select(col("tid"), col("eid"))
      .dropDuplicates("tid", "eid")
    val hits = cand
      .join(shT.select(col("doc_id").as("tid"), col("shingles").as("s_t")), Seq("tid"))
      .join(broadcast(shE.select(col("doc_id").as("eid"), col("shingles").as("s_e"))),
        Seq("eid"))
      .withColumn("jac",
        size(array_intersect(col("s_t"), col("s_e"))).cast("double") /
          size(array_union(col("s_t"), col("s_e"))))
      .filter(col("jac") >= threshold)
      .groupBy("tid")
      .agg(count(lit(1)).as("n_matches"), round(max(col("jac")), 4).as("max_jac"))
    // every train doc keeps its row — shingle-less (<3-token) docs and
    // non-candidates report 0 matches, uncontaminated
    train.select(col("doc_id"))
      .join(hits.withColumnRenamed("tid", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("max_jac"),
        col("n_matches").isNotNull.as("contaminated"))
  }

  /** [[ngramOverlap]] for eval sets too large to broadcast as a hash set
    * (a full eval-suite n-gram inventory reaches 10⁸+): identical output,
    * different membership machinery —
    *
    *  1. build a deterministic Bloom bitset over the eval n-grams as a
    *     distributed OR-aggregate ([[graft.functions.BloomSketch]]);
    *     broadcast size = bits/8 bytes (2 MiB at the 2^24 default),
    *     INDEPENDENT of the eval set's size;
    *  2. probe each doc's n-gram ARRAY against the broadcast bitset in
    *     one UDF call per row — no false negatives, so non-survivors are
    *     guaranteed misses and never explode past their own row;
    *  3. exact-confirm only the Bloom survivors (a false-positive-rate-
    *     sized fraction) through a plain semi-join with the DISTRIBUTED
    *     eval n-gram set — the one join that remains never sees a
    *     non-candidate row, and the eval side never needs to fit in one
    *     executor. The n-gram projection runs under two exchanges (stats
    *     + confirm) rather than being checkpointed — at corpus scale
    *     recomputing a projection beats materializing it.
    *
    * Results are row-identical to [[ngramOverlap]] (the gate reuses its
    * oracle verbatim); false positives cost only wasted confirm-join
    * rows, never wrong output. */
  def ngramOverlapBloom(train: DataFrame, eval: DataFrame, n: Int = 5,
      bits: Int = 1 << 24, numHash: Int = 4): DataFrame = {
    import graft.functions.BloomSketch
    val evalNg = ngrams(eval, n).select(explode(col("g")).as("ng")).distinct()
    val bitset = evalNg
      .select(explode(array((0 until numHash).map(j =>
        Dedup.hex60(concat(lit(s"$j:"), col("ng"))) % bits): _*)).as("pos"))
      .agg(BloomSketch.bitsetAgg(col("pos"), bits).as("bs"))
      .head().getSeq[Long](0).toArray
    val bc = train.sparkSession.sparkContext.broadcast(bitset)
    // one UDF call per ROW filters the doc's n-gram array down to the
    // Bloom survivors — only the false-positive-rate-sized remainder is
    // ever exploded into the confirm join
    val survivors = udf((g: Seq[String]) =>
      g.filter(BloomSketch.mightContain(bc.value, _, bits, numHash)))

    val perDoc = ngrams(train, n)
      .select(col("doc_id"), size(col("g")).cast("long").as("n_ngrams"),
        survivors(col("g")).as("__cand"))
    // zero-survivor docs keep their row via the left join + null-safe
    // counts; the exact confirm only ever sees Bloom survivors
    val confirmed = perDoc
      .select(col("doc_id"), explode(col("__cand")).as("ng"))
      .join(evalNg, Seq("ng"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
    perDoc.select(col("doc_id"), col("n_ngrams"))
      .join(confirmed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("n_ngrams"), 4)
          .as("contam_frac"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }
}
