package graft.streaming

import graft.mql.SparkTestBase
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

class IvfAssignStreamSpec extends SparkTestBase {

  test("streamed assignment equals batch k-means assignment; stateless plan") {
    val file = "/root/testdata/sf0.001/embeddings.parquet"
    val emb = spark.read.parquet(file)
    val streamed = IvfAssignStream.runToBatch(spark, file, "t_ivf_stream")
    // batch twin: same centroids, same argmax expression
    val cents = Similarity.kmeansCentroids(emb)
    val batch = IvfAssignStream.assign(emb, cents)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() == emb.count())
    // stateless: the streaming plan must not contain a state store op
    val explained = IvfAssignStream.assign(
      spark.readStream.schema(IvfAssignStream.embSchema)
        .parquet(java.nio.file.Files.createTempDirectory("graft-ivf-plan-").toString),
      cents).queryExecution.analyzed.toString
    assert(!explained.contains("StateStore") && !explained.contains("mapGroupsWithState"))
  }
}
