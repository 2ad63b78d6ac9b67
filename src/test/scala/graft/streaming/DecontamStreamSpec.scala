package graft.streaming

import graft.mql.SparkTestBase
import graft.pipeline.Decontam
import org.apache.spark.sql.functions._

class DecontamStreamSpec extends SparkTestBase {

  private val docFile = "/root/testdata/sf0.001/documents.parquet"

  test("streamed decontam equals the batch operator across micro-batches") {
    val out = DecontamStream.runToBatch(spark, docFile, "v_dec_spec")
    val all = spark.read.parquet(docFile)
    val batch = Decontam.ngramOverlap(
      all.filter(col("doc_id") % 37 =!= 0),
      all.filter(col("doc_id") % 37 === 0))
    assert(out.count() > 0)
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty,
      "streamed decontamination diverges from the batch operator")
  }
}
