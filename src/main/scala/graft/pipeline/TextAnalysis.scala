package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token statistics,
  * quality scoring, language-ID scoring, document fingerprinting. All pure
  * column expressions (codegen'd, pushdown-friendly, no UDFs). */
object TextAnalysis {

  /** whitespace tokenization + counts */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.withColumn("__t", split(lower(col("text")), " "))
      .select(
        col("doc_id"),
        size(col("__t")).cast("long").as("n_tokens"),
        size(array_distinct(col("__t"))).cast("long").as("n_distinct"),
        round(expr("aggregate(__t, cast(0 as double), (a, x) -> a + length(x))") /
          size(col("__t")), 4).as("avg_token_len"))

  /** GPT-2-style pre-tokenizer pattern, simplified to the RE2-compatible
    * subset (no lookahead) so any engine tokenizes identically: common
    * English contractions, letter runs, digit runs, punctuation runs —
    * each optionally preceded by one space — then residual whitespace. */
  val BpePattern = "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"

  /** BPE-ish token counting: the standard LLM-pipeline estimate of
    * sequence length before running the real tokenizer. `bpe_tokens` is
    * the pre-tokenizer piece count; `est_tokens` the chars/4 rule of
    * thumb; both pure codegen'd expressions. */
  def bpeTokens(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("long").as("bpe_tokens"),
      ceil(length(col("text")).cast("double") / 4).cast("long").as("est_tokens"))

  private val Stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** heuristic quality metrics: length, punctuation density, stopword
    * ratio, all-caps ratio, and a composite score in [0,1] */
  def quality(docs: DataFrame): DataFrame =
    withQuality(docs)
      .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
        col("stop_ratio"), col("quality_score"),
        (col("quality_score") >= 0.5).as("passes"))

  /** the quality metric columns appended to `docs` (all source columns
    * retained) — shared by [[quality]] and [[qualityGateByLang]] so the
    * two can never diverge on the score definition */
  private def withQuality(docs: DataFrame): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    docs.withColumn("__t", split(lower(col("text")), " "))
      .withColumn("n_tokens", size(col("__t")).cast("long"))
      .withColumn("punct_ratio",
        round((length(col("text")) -
          length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).cast("double") /
          greatest(length(col("text")), lit(1)), 4))
      .withColumn("stop_ratio",
        round(size(array_intersect(col("__t"), stopArr)).cast("double") /
          greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_tokens").cast("double") / 50) * (lit(1.0) - col("punct_ratio")), 4))
  }

  /** Per-language adaptive quality gate: keep a document iff its quality
    * score clears its OWN language's q-th percentile — the
    * CCNet/RefinedWeb posture where thresholds are calibrated per
    * language (a fixed global cutoff over-prunes low-resource languages
    * whose score distribution sits lower).
    *
    * Determinism: scores are 4-dec-rounded before the percentile, and the
    * interpolated `percentile` is the engine-exact arithmetic already
    * pinned by the `q_percentile` gate (Spark `percentile` ≡ DuckDB
    * `quantile_cont` bit-for-bit on these inputs); the filter compares
    * against the UNROUNDED cutoff on both sides.
    *
    * Scale shape: one corpus scan computes scores (pure codegen'd
    * expressions), the per-language cutoff table is language-count-sized
    * (a map-side-combined agg), and the join back is an explicit
    * broadcast — the corpus itself never shuffles. */
  def qualityGateByLang(docs: DataFrame, q: Double = 0.25): DataFrame = {
    // checkpoint the 3-column scored frame: it feeds BOTH the cutoff agg
    // and the verdict join, and the regexp-heavy score expressions are
    // the expensive part — one corpus scan instead of two
    val scored = withQuality(docs)
      .select(col("doc_id"), col("lang"), col("quality_score"))
      .localCheckpoint()
    val cuts = scored.groupBy("lang")
      .agg(expr(s"percentile(quality_score, $q)").as("__cut"))
    scored.join(broadcast(cuts), "lang")
      .filter(col("quality_score") >= col("__cut"))
      .select(col("doc_id"), col("lang"), col("quality_score"),
        round(col("__cut"), 4).as("lang_cutoff"))
  }

  /** BM25 ranked retrieval (Okapi, k1=1.2, b=0.75) for a fixed query term
    * set — the relevance scorer behind corpus search / RAG candidate
    * retrieval; complements [[tfidfTopTerms]] (per-doc keywords) with the
    * per-QUERY document ranking.
    *
    * Determinism: BM25's idf `ln((N−df+0.5)/(df+0.5) + 1)` is rewritten
    * exactly as `ln(2N+2) − ln(2df+1)` — both logs over INTEGER
    * arguments (the engine-exact tf-idf discipline); each term's
    * contribution is fixed to micro-units (round(·1e6) as LONG) so the
    * per-doc sum across query terms is integer and order-free; ties rank
    * by doc_id.
    *
    * Scale shape: the explode is filtered to the query terms BEFORE the
    * (doc_id, term) aggregation, so only matching postings shuffle — the
    * corpus never does. df comes from that same tiny frame (broadcast
    * back), N and total token count are one agg job (driver scalars), and
    * the global top-k is TakeOrdered (k rows per partition to the driver,
    * never a single-partition window). */
  def bm25TopDocs(docs: DataFrame,
      queryTerms: Seq[String] = BM25QueryTerms,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = docs.select(size(split(lower(col("text")), " ")).cast("long").as("__dl"))
      .agg(count(lit(1)).as("n"), sum("__dl").as("tot")).head()
    bm25Rank(bm25Postings(docs, queryTerms), stats.getLong(0), stats.getLong(1),
      k, k1, b)
  }

  val BM25QueryTerms: Seq[String] = Seq("table", "spark", "hash", "merge", "window")

  /** the (doc_id, term, tc, dl) postings frame for the query terms —
    * filtered BEFORE aggregation so only matching tokens shuffle; also
    * the incremental state a streaming index maintainer keeps (whole
    * documents arrive, so a doc's postings never change once emitted —
    * the aggregation is monotone across micro-batches) */
  def bm25Postings(docs: DataFrame, queryTerms: Seq[String] = BM25QueryTerms): DataFrame =
    docs.withColumn("__t", split(lower(col("text")), " "))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tc"), first(col("dl")).as("dl"))

  /** BM25 scoring over a postings frame + corpus scalars — shared by the
    * batch operator and the streaming index maintainer so the two can
    * never diverge on the arithmetic */
  def bm25Rank(tf: DataFrame, nDocs: Long, totalTokens: Long,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = round(log(lit((2 * nDocs + 2).toDouble)) -
      log((col("df") * 2 + 1).cast("double")), 6)
    val dlNorm = col("dl").cast("double") * nDocs / totalTokens
    val contrib = idf * (col("tc").cast("double") * (k1 + 1)) /
      (col("tc").cast("double") + lit(k1) * (lit(1 - b) + lit(b) * dlNorm))
    val perDoc = tf.join(broadcast(dfT), "term")
      .withColumn("__c", round(contrib * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("__s").desc, col("doc_id")).limit(k)
    // rank the k survivors; the window runs on k rows, not the corpus
    perDoc.withColumn("rk",
        row_number().over(Window.orderBy(col("__s").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("n_terms_hit"),
        round(col("__s").cast("double") / 1e6, 4).as("bm25"), col("rk"))
  }

  /** Inverted-index segment build: per term, document frequency, total
    * collection frequency, and the head postings block (first
    * `maxPostings` doc_ids by id, encoded `doc:tf`) — the search-index
    * construction pass, emitted segment-wise exactly as a distributed
    * index builder writes it.
    *
    * Scale shape: one (term, doc_id) aggregation for tf (map-side
    * combine), then df/cf as a second term-keyed agg — both shuffles key
    * on the term, so AQE co-locates the final join. The head block is cut
    * by a per-term row_number window BEFORE collect_list, which plans as
    * WindowGroupLimit (partial limits run map-side), so no term — not
    * even a stopword — ever gathers more than `maxPostings` rows into a
    * single state; full postings lists at 100 TB are exactly this,
    * repeated per block. */
  def invertedIndex(docs: DataFrame, maxPostings: Int = 32): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tc"))
      .localCheckpoint()
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tc")).as("cf"))
    val w = Window.partitionBy("term").orderBy("doc_id")
    val head = tf.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPostings)
      .groupBy("term")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tc")))).as("__p"))
      .select(col("term"), concat_ws(",",
        expr("transform(__p, x -> concat(x.doc_id, ':', x.tc))")).as("postings"))
    stats.join(head, "term")
      .select(col("term"), col("df"), col("cf"), col("postings"))
  }

  /** n-gram-free language-ID heuristic: score = stopword-marker hits per
    * candidate language (the production version would use char n-gram
    * profiles; the mechanism — score columns + argmax — is identical).
    * `predicted` is the true argmax over all four scores: array_max on
    * (score, -rank) structs (lexicographic struct comparison — max score,
    * ties to the alphabetically-first language, the [[Similarity.bestCentroidExpr]]
    * pattern), "unk" only when every score is zero. */
  def langId(docs: DataFrame): DataFrame = {
    val markers = Map(
      "en" -> Seq("the", "a", "and", "of", "value", "table"),
      "de" -> Seq("der", "die", "das", "und"),
      "fr" -> Seq("le", "la", "et", "les"),
      "es" -> Seq("el", "la", "y", "de"))
    val ordered = markers.keys.toSeq.sorted
    var out = docs.withColumn("__t", split(lower(col("text")), " "))
    for ((l, ws) <- markers.toSeq.sortBy(_._1))
      out = out.withColumn(s"score_$l",
        size(array_intersect(col("__t"), array(ws.map(lit): _*))).cast("long"))
    val best = array_max(array(ordered.zipWithIndex.map { case (l, i) =>
      struct(col(s"score_$l").as("s"), lit(-i).as("nr"))
    }: _*))
    val predLang = element_at(array(ordered.map(lit): _*),
      (-best.getField("nr") + 1).cast("int"))
    out.select(col("doc_id"), col("lang"),
      col("score_de"), col("score_en"), col("score_es"), col("score_fr"),
      when(best.getField("s") > 0, predLang).otherwise("unk").as("predicted"))
  }

  /** normalized-content fingerprints: md5 of the canonical form plus a
    * 60-bit numeric fingerprint (for bucketing/sharding) */
  def fingerprint(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    docs.select(col("doc_id"),
      md5(norm).as("fp"),
      Dedup.hex60(norm).as("fp60"))
  }

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9()\\-]{6,}"

  /** PII-style scrubbing: replace email addresses and phone-like tokens,
    * and count what was removed — pure regexp column expressions (the
    * production pass adds more patterns, not more machinery). The test
    * corpus carries no PII, so the gate query appends a synthetic
    * per-document contact string before scrubbing to prove the redaction
    * actually fires. */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("redacted"))

  /** Gopher/MassiveText-style repetition signals, per doc: unique-token
    * ratio, the token fraction covered by the single most frequent
    * bigram, and the fraction of bigram occurrences that are repeats.
    * Heavily self-repetitive machine text scores high on the last two.
    *
    * One corpus scan: per-doc scalars ride through the bigram explode
    * (first() in the partial agg), so the shape is explode → two keyed
    * aggregations with map-side combine — no joins back to the source,
    * nothing wide shuffled. */
  def repetition(docs: DataFrame): DataFrame = {
    val exploded = docs.withColumn("__t", split(lower(col("text")), " "))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"),
        size(col("__t")).cast("long").as("n_tokens"),
        round(size(array_distinct(col("__t"))).cast("double") / size(col("__t")), 4)
          .as("uniq_ratio"),
        explode(expr(
          "transform(sequence(0, size(__t) - 2), i -> concat_ws(' ', __t[i], __t[i+1]))"))
          .as("b"))
    exploded
      .groupBy("doc_id", "b")
      .agg(count("*").as("cnt"),
        first(col("n_tokens")).as("n_tokens"), first(col("uniq_ratio")).as("uniq_ratio"))
      .groupBy("doc_id")
      .agg(first(col("n_tokens")).as("n_tokens"), first(col("uniq_ratio")).as("uniq_ratio"),
        max(col("cnt")).as("__top"), sum(col("cnt")).as("__nbg"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("__dup"))
      .select(col("doc_id"), col("n_tokens"), col("uniq_ratio"),
        round(col("__top").cast("double") / col("__nbg"), 4).as("top_bigram_frac"),
        round(col("__dup").cast("double") / col("__nbg"), 4).as("dup_bigram_frac"))
  }

  /** Per-document top-k tf-idf terms — keyword extraction for corpus
    * exploration and topic-balance audits.
    *
    * Determinism: idf = round(ln N − ln df, 6) with both logs over
    * INTEGER arguments (JVM Math.log and DuckDB ln agree bit-for-bit on
    * integers across the tested range; the 6-dec rounding absorbs the
    * rare last-ulp stragglers), score = round(tf · idf, 6), ties rank by
    * term — the same pinning discipline as the cosine operators.
    *
    * Scale shape: one shuffle on (doc_id, term) for tf (doc length rides
    * along); the tf frame is localCheckpoint'ed so the tokenize+agg run
    * ONCE, then df is a plain `groupBy(term).count()` — map-side combine,
    * no skew: a stopword's partial counts merge tree-wise instead of
    * funnelling every posting row through one window partition. The df
    * table is vocab-sized, so the join back is broadcast. Top-k per doc
    * is the partial-WindowGroupLimit shape — nothing corpus-sized is
    * collected anywhere. `nDocs` is one count job (a driver scalar). */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val nDocs = docs.count()
    val toks = docs.withColumn("__t", split(lower(col("text")), " "))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
    val tf = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tc"), first(col("dl")).as("dl"))
      .localCheckpoint()
    val dfTable = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfTable), "term")
      .withColumn("__idf",
        round(log(lit(nDocs.toDouble)) - log(col("df").cast("double")), 6))
      .withColumn("__raw", col("tc").cast("double") / col("dl") * col("__idf"))
    // rank on the 6-dec rounding (absorbs ulp noise), but emit the 4-dec
    // rounding of the RAW score — rounding an already-rounded value
    // manufactures exact .5 boundaries where decimal-HALF_UP (Spark) and
    // binary rounding (other engines) disagree
    val w = Window.partitionBy("doc_id")
      .orderBy(round(col("__raw"), 6).desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"),
        round(col("__raw"), 4).as("tfidf"), col("rk").cast("long").as("rk"))
  }

  /** Per-(lang, source) corpus rollup — the composition/balance audit a
    * training-mix owner reads first: document counts, char/token volume,
    * and mean document length. One scan, map-side combined keyed
    * aggregation; integer sums + one rounded division (engine-exact). */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.withColumn("__nt", size(split(col("text"), " ")).cast("long"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        sum(col("__nt")).as("total_tokens"),
        round(sum(length(col("text")).cast("long")).cast("double") /
          count(lit(1)), 2).as("avg_doc_chars"))

  /** Char-bigram language-model score — the engine's stand-in for the
    * CCNet/KenLM perplexity filter: train a character-bigram model on the
    * corpus itself, score each document by mean negative log-likelihood
    * (nats per bigram). Fluent text reuses the corpus's common bigrams and
    * scores LOW; gibberish, encoding noise and non-text payloads hit rare
    * bigrams and score HIGH — rank-filtering on `char_lm_nll` is the
    * standard quality gate (the production version swaps in a KenLM model
    * trained on a reference corpus; the plan shape is identical).
    *
    * Determinism (the tf-idf discipline): per-bigram surprisal is
    * round((ln total − ln cnt)·1e6) as a LONG — both logs over integer
    * arguments, so JVM and any IEEE engine agree — and the per-doc sum is
    * integer arithmetic (order-free), divided and 4-dec-rounded only at
    * the end. No float accumulates across rows anywhere.
    *
    * Scale shape: the per-doc bigram histogram is computed IN THE ROW by
    * the codegen'd [[graft.functions.CharBigramsExpr]] (one compiled pass
    * per document), so the exploded frame carries per-doc DISTINCT
    * bigrams (≈ charset²-bounded) instead of one row per occurrence —
    * the corpus-characters-sized (doc_id, bigram) shuffle the previous
    * HOF formulation paid is gone entirely. The frame is checkpointed and
    * reused for BOTH the model (groupBy(b).sum — map-side combine,
    * vocab-sized, broadcastable) and the scoring join back. `total` is a
    * driver scalar; nothing corpus-sized is collected. The repartition
    * spreads the single-file scan (same posture as `Dedup.simhash`). */
  def charLmScore(docs: DataFrame): DataFrame = {
    val db = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.CharBigramsExpr.bigramCounts(lower(col("text")))))
      .withColumnRenamed("key", "b").withColumnRenamed("value", "occ")
      .localCheckpoint()
    val model = db.groupBy("b").agg(sum("occ").as("cnt"))
    val total = model.agg(sum("cnt")).head().getLong(0)
    val nll = model.select(col("b"),
      round((log(lit(total.toDouble)) - log(col("cnt").cast("double"))) * 1e6)
        .cast("long").as("nll6"))
    db.join(broadcast(nll), "b")
      .groupBy("doc_id")
      .agg(sum("occ").as("n_bigrams"), sum(col("occ") * col("nll6")).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s").cast("double") / 1e6 / col("n_bigrams"), 4).as("char_lm_nll"))
  }

  /** Corpus-wide most-frequent n-grams — the boilerplate detector (nav
    * bars, cookie banners, license headers surface as high-doc-frequency
    * n-grams; the usual pipeline action is to strip or downweight them).
    *
    * Shape: explode n-grams → one keyed aggregation (count with map-side
    * combine; doc frequency as a two-phase distinct count) → global top-k.
    * The top-k is a TakeOrdered over (gram, occ, n_docs) rows — k rows per
    * partition to the driver, never a single-partition window. Ties break
    * by gram so the cut is deterministic across engines. */
  def topNgrams(docs: DataFrame, n: Int = 3, k: Int = 20): DataFrame = {
    val gramExpr = (0 until n).map(j => s"__t[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
    val grams = docs.withColumn("__t", split(lower(col("text")), " "))
      .filter(size(col("__t")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, size(__t) - $n), i -> $gramExpr)")).as("gram"))
    val counted = grams.groupBy("gram")
      .agg(count(lit(1)).as("occ"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("occ").desc, col("gram")).limit(k)
    // rank the k survivors; the window runs on k rows, not the corpus
    counted.withColumn("rk",
      row_number().over(Window.orderBy(col("occ").desc, col("gram"))).cast("long"))
  }
}
