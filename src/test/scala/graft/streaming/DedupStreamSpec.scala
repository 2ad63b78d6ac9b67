package graft.streaming

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._

/** Streaming dedup must suppress duplicates ACROSS micro-batches (state
  * store), not just within a batch: the same file staged as two triggers
  * yields exactly the single-copy distinct set. */
class DedupStreamSpec extends SparkTestBase {

  test("second micro-batch is fully suppressed by dedup state") {
    val file = "/root/testdata/sf0.001/documents.parquet"
    val docs = spark.read.parquet(file)
    val nDistinct = docs.select(md5(col("text"))).distinct().count()

    val admitted = DedupStream.runToBatch(spark, file, "t_stream_dedup", copies = 2)
    assert(admitted.count() == nDistinct,
      s"expected $nDistinct admitted rows (2x input fully deduped)")
    assert(admitted.select("fingerprint").distinct().count() == nDistinct)
  }
}
