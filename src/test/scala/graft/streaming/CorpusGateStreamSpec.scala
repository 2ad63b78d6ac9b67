package graft.streaming

import graft.mql.SparkTestBase
import graft.pipeline.{Decontam, TextAnalysis}
import org.apache.spark.sql.functions._

/** The stateless streaming admission gate must produce EXACTLY the
  * verdicts the batch operators compose to — quality, language and
  * contamination per document — including docs too short to carry an
  * n-gram (uncontaminated by definition). */
class CorpusGateStreamSpec extends SparkTestBase {

  test("streamed admission verdicts equal the batch composition") {
    val file = "/root/testdata/sf0.001/documents.parquet"
    val docs = spark.read.parquet(file)
    val train = docs.filter(col("doc_id") % 37 =!= 0)
    val eval = docs.filter(col("doc_id") % 37 === 0)
    val streamed = CorpusGateStream.runToBatch(spark, file, "t_gate")

    val q = TextAnalysis.quality(train).select("doc_id", "quality_score")
    val l = TextAnalysis.langId(train).select("doc_id", "predicted")
    val c = Decontam.ngramOverlap(train, eval).select(col("doc_id"), col("contaminated"))
    val batch = q.join(l, "doc_id").join(c, Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
      .select(col("doc_id"), col("quality_score"), col("predicted"),
        col("contaminated"),
        (col("quality_score") >= 0.5 && col("predicted") === "en" &&
          !col("contaminated")).as("admitted"))

    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed gate verdicts must equal the batch composition")
    // the gate genuinely discriminates on this corpus
    assert(streamed.filter(col("admitted")).count() > 0)
    assert(streamed.filter(col("contaminated")).count() > 0)
    assert(streamed.filter(!col("admitted")).count() > 0)
  }
}
