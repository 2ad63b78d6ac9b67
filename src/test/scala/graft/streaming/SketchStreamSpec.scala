package graft.streaming

import graft.mql.SparkTestBase
import graft.pipeline.Sketches
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SketchStreamSpec extends SparkTestBase {

  private val file = "/root/testdata/sf0.001/documents.parquet"

  test("streamed KMV state equals the batch sketch (gate shape)") {
    val streamed = SketchStream.runToBatch(spark, file, "t_sketch_stream")
      .select("source", "k_used", "kmv_est")
    val batch = Sketches.distinctTokenKmv(spark.read.parquet(file))
      .select("source", "k_used", "kmv_est")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("per-source state merges across micro-batches (low/high id split)") {
    // source = doc_id % 20 in the corpus, so a PARITY split never puts one
    // source in two batches; a low/high split puts EVERY source in both —
    // equality then requires the KMV buffers to merge across batches
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-sketch-stream-")
    graft.TempDirs.register(d)
    val docs = spark.read.parquet(file)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    for ((pred, tag) <- Seq((col("doc_id") <= cut) -> "low", (col("doc_id") > cut) -> "high")) {
      val sub = d.resolve(s"__stage_$tag")
      docs.filter(pred).coalesce(1).write.parquet(sub.toString)
      val part = Files.list(sub).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, d.resolve(s"$tag.parquet"), StandardCopyOption.ATOMIC_MOVE)
      Files.walk(sub).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    val bothBatches = docs.groupBy("source")
      .agg(countDistinct(when(col("doc_id") <= cut, 0).otherwise(1)).as("halves"))
      .filter(col("halves") === 2).count()
    assert(bothBatches == 20, s"split degenerate: $bothBatches sources span batches")

    val stream = spark.readStream.schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
    val q = SketchStream.vocabSketch(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("t_sketch_merge").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("t_sketch_merge")
    val batch = Sketches.distinctTokenKmv(docs).select("source", "k_used", "kmv_est")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
