package graft.functions

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import CharBigramsExpr.bigramCounts

class CharBigramsExprSpec extends SparkTestBase {

  /** the per-occurrence HOF + groupBy formulation the oracle mirrors */
  private def hofCounts(df: org.apache.spark.sql.DataFrame) =
    df.filter(length(col("text")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(lower(text)) - 1), i -> substring(lower(text), i, 2))"))
        .as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("occ"))

  private def nativeCounts(df: org.apache.spark.sql.DataFrame) =
    df.filter(length(col("text")) >= 2)
      .select(col("doc_id"), explode(bigramCounts(lower(col("text")))))
      .withColumnRenamed("key", "b").withColumnRenamed("value", "occ")

  test("identical to the per-occurrence HOF + groupBy on real documents") {
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(300)
    val native = nativeCounts(docs)
    val hof = hofCounts(docs)
    assert(native.count() > 0)
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("edge cases: repeats, unicode code points, short strings") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaa"),          // 3x "aa"
      (2L, "héllo wörld"),   // multi-byte chars pair with neighbors
      (3L, "ab"),            // exactly one bigram
      (4L, "x"),             // below the length-2 floor: filtered out
      (5L, "ABba")).toDF("doc_id", "text")
    val native = nativeCounts(df)
    val hof = hofCounts(df)
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    val aaaa = native.filter(col("doc_id") === 1L && col("b") === "aa")
      .select("occ").head().getLong(0)
    assert(aaaa == 3L)
    // case folding happens outside: ABba lowercases to abba => ab,bb,ba
    assert(native.filter(col("doc_id") === 5L).count() == 3)
    assert(native.filter(col("doc_id") === 4L).count() == 0)
  }

  test("charLmScore end-to-end still matches its oracle shape") {
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val scored = graft.pipeline.TextAnalysis.charLmScore(docs)
    assert(scored.count() == docs.filter(length(col("text")) >= 2).count())
    // nll is positive and finite for every doc
    assert(scored.filter(col("char_lm_nll") <= 0 || col("char_lm_nll").isNull).count() == 0)
  }

  test("SQL registration") {
    CharBigramsExpr.register(spark)
    val m = spark.sql("SELECT graft_char_bigrams('abab') AS m").head()
      .getMap[String, Long](0)
    assert(m("ab") == 2L && m("ba") == 1L)
  }
}
