package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.pipeline.Similarity

/** Streaming IVF index ingestion — the online half of the ANN index
  * lifecycle: centroids are trained OFFLINE (deterministic Lloyd k-means
  * on the static corpus, [[Similarity.kmeansCentroids]]), and arriving
  * vectors are assigned to their bucket STATELESSLY — the centroids fold
  * into plan-time literals, so per-batch cost is one narrow codegen'd
  * pass, no state store, no watermark, append mode. This is how FAISS-
  * style services grow an index between retrains: assignment is cheap
  * and incremental, retraining is a periodic batch job.
  *
  * The gate's oracle is the batch k-means assignment (`asg` in the
  * ivf_kmeans CTE chain) — streamed assignment must agree exactly. */
object IvfAssignStream {

  private[streaming] val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** stateless per-vector bucket assignment against trained centroids */
  def assign(stream: DataFrame,
      centroids: Seq[(Long, Array[Double], Double)]): DataFrame =
    stream
      .withColumn("norm", Similarity.norm(col("embedding")))
      .select(col("vec_id"),
        Similarity.bestCentroidExpr(centroids).as("bucket"))

  /** embeddings staged as two parity micro-batches; centroids trained on
    * the static file (train offline, assign online) */
  def runToBatch(spark: SparkSession, embFile: String, name: String): DataFrame = {
    val dir = DedupStream.stageParitySplit(spark, embFile, keyCol = "vec_id")
    val centroids = Similarity.kmeansCentroids(spark.read.parquet(embFile))
    val stream = spark.readStream.schema(embSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = assign(stream, centroids)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
