package graft.streaming

import graft.mql.SparkTestBase
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** The incremental LSH near-dup query must find exactly the batch
  * operator's pairs — including pairs whose members arrived in DIFFERENT
  * micro-batches (the parity split guarantees such pairs exist whenever
  * an even-id doc is a near-dup of an odd-id doc). */
class NearDupStreamSpec extends SparkTestBase {

  test("streamed near-dup pairs equal batch MinHash-LSH pairs") {
    val file = "/root/testdata/sf0.001/documents.parquet"
    val batch = Dedup.minhashPairs(spark.read.parquet(file))
      .select("doc_a", "doc_b", "jac")
    val streamed = DedupStream.runNearDupToBatch(spark, file, "t_stream_neardup")

    assert(streamed.count() > 0, "expected planted near-dup pairs")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed pair set must equal the batch pair set")

    val crossParity = streamed
      .filter(col("doc_a") % 2 =!= col("doc_b") % 2).count()
    assert(crossParity > 0,
      "expected at least one pair spanning the two micro-batches")
  }
}
