package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float>[64], label).
  *
  * Scale design: brute-force cosine is the correctness baseline — a
  * broadcast of the (small) query set against the full table, one codegen'd
  * pass, no shuffle beyond the final top-k. The scale path is LSH
  * bucketing (sign-random-projection): candidates only join within a
  * bucket, turning O(n·q) into O(n + collisions). An IVF variant would
  * replace the bucket key with a learned-centroid assignment — same plan
  * shape (bucket key join), different key function.
  *
  * Dot products run in doubles with a fixed left-to-right fold so the
  * DuckDB oracle (same fold order) reproduces them bit-for-bit; ranking
  * uses the 6-decimal rounding + vec_id tiebreak to be engine-stable.
  */
object Similarity {

  private val dotExpr =
    "aggregate(zip_with(q_emb, embedding, (a, b) -> cast(a as double) * cast(b as double)), " +
      "cast(0 as double), (acc, x) -> acc + x)"

  private val normExpr =
    "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), " +
      "cast(0 as double), (acc, x) -> acc + x))"

  /** exact top-k cosine neighbors for query vectors (vec_id < nQueries),
    * excluding self-matches. */
  def bruteCosineTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val withNorm = emb.withColumn("norm", expr(normExpr))
    val queries = withNorm.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"))
    val joined = withNorm.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", expr(dotExpr) / (col("norm") * col("q_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("sim"), 6).desc, col("vec_id"))
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("sim"), 4).as("sim"), col("rk").cast("long").as("rk"))
  }

  /** LSH (sign projection) near-neighbor pairs: bucket on the sign bits of
    * the first `bits` dimensions (axis-aligned hyperplanes — deterministic
    * and engine-portable; swap in seeded random planes for production),
    * exact cosine within buckets, threshold filter. */
  def lshCosinePairs(emb: DataFrame, bits: Int = 8, threshold: Double = 0.35): DataFrame = {
    val bucketed = emb
      .withColumn("bucket", expr(
        s"aggregate(sequence(0, ${bits - 1}), 0, (acc, i) -> " +
          "acc + CASE WHEN embedding[i] > cast(0 as float) THEN shiftleft(1, i) ELSE 0 END)"))
      .withColumn("norm", expr(normExpr))
    val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("q_emb"), col("norm").as("norm_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding"), col("norm").as("norm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", expr(dotExpr) / (col("norm_a") * col("norm_b")))
      .filter(round(col("sim"), 6) >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
