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

  test("segment admission suppresses the planted header across parity batches") {
    val file = "/root/testdata/sf0.001/documents.parquet"
    val admitted = DedupStream.runSegmentsToBatch(spark, file, "t_stream_segs")
      .cache()
    // the planted header sits on every 4th doc — instances in BOTH parity
    // halves — yet is admitted exactly once
    val header = "shared header banner intro card segment alpha beta gamma delta"
    assert(admitted.filter(col("seg") === header).count() == 1)
    // exact contract: the admitted SET equals the planted corpus's
    // distinct segment set (batch-computed with the same segmentation)
    val planted = spark.read.parquet(file).withColumn("text",
      when(col("doc_id") % 4 === 0, concat(lit(header + " "), col("text")))
        .otherwise(col("text")))
    val expect = planted
      .withColumn("__t", split(lower(col("text")), " "))
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(__t) / 10.0) as int) - 1), " +
        "i -> array_join(slice(__t, i * 10 + 1, 10), ' '))")).as("seg"))
      .distinct()
    assert(admitted.select("seg").exceptAll(expect).isEmpty &&
      expect.exceptAll(admitted.select("seg")).isEmpty,
      "admitted segment set != distinct segment set")
    // and no duplicate admissions at all
    assert(admitted.select("seg").distinct().count() == admitted.count())
  }
}
