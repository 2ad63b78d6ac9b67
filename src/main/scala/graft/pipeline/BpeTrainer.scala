package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING as a distributed job — the missing
  * half of the tokenizer story next to [[TextAnalysis.bpeTokens]] (which
  * only counts pieces with a fixed pre-tokenizer): learn the merge table
  * itself from the corpus, exactly the HF-tokenizers/GPT-2 recipe.
  *
  * Algorithm (standard BPE): pre-tokenize to lowercase alphanumeric
  * words, reduce the corpus to the DISTINCT-WORD + count frame (the
  * trainer's whole working set is vocabulary-sized, never corpus-sized —
  * the reason BPE training scales), split every word into single-char
  * symbols, then repeat `merges` times: count adjacent symbol pairs
  * weighted by word count, take the most frequent pair (ties break
  * lexicographically), and merge its occurrences left-to-right in every
  * word.
  *
  * Engine-exact representation: a word's symbol sequence is one string
  * of guarded blocks `sym…`, so "merge pair (L,R)" is ONE
  * plain substring `replace` of `⟨L⟩⟨R⟩` with `⟨LR⟩` — substring replace
  * scans left-to-right non-overlapping in every engine (`aaaa` +
  * merge(a,a) → `aa·aa`, the BPE greedy), the guard bytes make
  * partial-symbol matches impossible, and the pre-tokenizer's [a-z0-9]+
  * guarantees guards never appear in content. The DuckDB oracle replays
  * the same rounds as chained CTEs over identical strings.
  *
  * Scale shape: one corpus-sized pass builds the word-count frame
  * (map-side combined); each round is then a vocab-sized explode +
  * keyed aggregation and ONE driver-collected row (the argmax pair) —
  * `merges` rounds = `merges` small shuffles over the vocabulary. The
  * per-round replace is a pure per-row expression, checkpointed so plan
  * depth stays constant. */
object BpeTrainer {

  val L = ""
  val R = ""

  /** "hello" -> ⟨h⟩⟨e⟩⟨l⟩⟨l⟩⟨o⟩ with / guards */
  private[pipeline] def charEncodeSql(wCol: String): Column =
    expr(s"array_join(transform(sequence(1, length($wCol)), " +
      s"i -> concat('$L', substr($wCol, i, 1), '$R')), '')")

  /** symbol list of an encoded word in column `c` (outer guards trimmed,
    * split on the `⟩⟨` boundary) */
  private def symbolsOfSql(c: String): Column =
    split(expr(s"substring($c, 2, length($c) - 2)"), s"$R$L")

  /** adjacent (left, right) symbol pairs of the encoded word column */
  private def pairsOfSql(c: String): Column = {
    val syms = symbolsOfSql(c)
    zip_with(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  private def applyMerge(sym: Column, l: String, r: String): Column =
    replace(sym, lit(s"$L$l$R$L$r$R"), lit(s"$L$l$r$R"))

  /** Learn the top-`merges` BPE merge rules. One row per rule:
    * (rk, left, right, merged, pair_count) — pair_count is the weighted
    * corpus frequency at selection time. */
  def trainMerges(docs: DataFrame, merges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(charEncodeSql("w").as("sym"), col("cnt"))
      .localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rk = 1
    var dry = false // pairs exhausted → later rounds would be no-op jobs
    while (rk <= merges && !dry) {
      val top = words
        .select(col("cnt"), explode(pairsOfSql("sym")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty) dry = true
      else {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += ((rk, l, r, pc))
        words = words
          .withColumn("sym", applyMerge(col("sym"), l, r))
          .localCheckpoint()
      }
      rk += 1
    }
    rules.toSeq
      .map { case (rk, l, r, pc) => (rk.toLong, l, r, l + r, pc) }
      .toDF("rk", "left", "right", "merged", "pair_count")
  }

  /** Apply a learned merge table in rank order and count the resulting
    * pieces per document — the encode side of the trainer. */
  def encodeWithMerges(docs: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val applied = rules.foldLeft(charEncodeSql("w")) {
      case (acc, (l, r)) => applyMerge(acc, l, r)
    }
    docs
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .select(col("doc_id"), applied.as("sym"))
      .select(col("doc_id"),
        size(split(expr("substring(sym, 2, length(sym) - 2)"), s"$R$L"))
          .cast("long").as("pieces"))
      .groupBy("doc_id").agg(sum("pieces").as("bpe_pieces"))
  }
}
