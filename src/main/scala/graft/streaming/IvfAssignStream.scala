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
    import java.nio.file.{Files, StandardCopyOption}
    val d = Files.createTempDirectory("graft-ivf-stream-")
    graft.TempDirs.register(d)
    val emb = spark.read.parquet(embFile)
    for ((par, tag) <- Seq(0 -> "even", 1 -> "odd")) {
      val sub = d.resolve(s"__stage_$tag")
      emb.filter(col("vec_id") % 2 === par).coalesce(1).write.parquet(sub.toString)
      val part = Files.list(sub).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, d.resolve(s"${par}_$tag.parquet"), StandardCopyOption.ATOMIC_MOVE)
      Files.walk(sub).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    val centroids = Similarity.kmeansCentroids(emb)
    val stream = spark.readStream.schema(embSchema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
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
