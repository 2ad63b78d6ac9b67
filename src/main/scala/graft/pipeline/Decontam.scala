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
}
