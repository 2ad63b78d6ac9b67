package graft.streaming

import graft.mql.SparkTestBase
import graft.pipeline.TextAnalysis

class RetrievalStreamSpec extends SparkTestBase {

  test("streamed index state scores identically to the batch BM25 operator") {
    val file = "/root/testdata/sf0.001/documents.parquet"
    val streamed = RetrievalStream.runToBatch(spark, file, "t_bm25_stream")
    val batch = TextAnalysis.bm25TopDocs(spark.read.parquet(file))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0)
  }

  test("postings state is bounded by query-term matches, not the corpus") {
    val file = "/root/testdata/sf0.001/documents.parquet"
    val docs = spark.read.parquet(file)
    val postings = TextAnalysis.bm25Postings(docs)
    val nPost = postings.count()
    // every state row carries a query term; vocabulary never enters state
    import org.apache.spark.sql.functions._
    assert(postings.filter(!col("term").isin(TextAnalysis.BM25QueryTerms: _*))
      .count() == 0)
    // strictly smaller than the full (doc, term) space
    val full = docs.select(explode(split(lower(col("text")), " ")).as("t"),
      col("doc_id")).distinct().count()
    assert(nPost < full / 4, s"postings $nPost vs full $full")
  }
}
