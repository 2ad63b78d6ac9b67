package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a GENUINE mult× parquet corpus from an sf dir — materialized on
  * disk, content-perturbed per replica — so the scale run measures real
  * data, not in-memory clones (round-4 verdict item 6: the clone corpus
  * makes every document mult-1 exact near-duplicates, growing the pair
  * output quadratically in mult; real corpora grow near-dups ~linearly).
  *
  * Replica r of each table shifts ids by r·N (keys stay dense, so the
  * derived catalog's heap provenance and zero-padded fids stay valid) and
  * perturbs CONTENT deterministically:
  *
  *  - `documents`: every token whose CONTENT hash ≡ 0 (mod 3) gets a
  *    replica suffix — content-keyed, not position-keyed, so the transform
  *    is alignment-invariant: near-dup PAIRS WITHIN a replica survive
  *    bit-exactly (identical tokens transform identically even across
  *    insertions/deletions), while ~70% of a replica's word-3-gram
  *    shingles (`Dedup.shingleExpr`) contain a suffixed token ⇒
  *    cross-replica Jaccard ≈ 0.17, far below any dedup threshold. Pair
  *    count grows ~mult×, the realistic shape (clones grow it mult²).
  *  - `embeddings`: the vector is rotated by r positions — an orthogonal
  *    transform, so norms and intra-replica geometry are exactly preserved
  *    (each replica keeps the base cluster structure in a different basis)
  *    while cross-replica dot products decorrelate.
  *  - `orders`: keys shift by r·N (metadata derives from the key, so every
  *    replica's catalog rows genuinely differ); the shredded-store ingest
  *    and every MQL plan then run against mult× real catalog rows.
  *
  * The remaining base tables are symlinked so `Bench`/`Verify` run
  * unmodified against the derived dir:
  *
  *   sbt "runMain graft.ScaleData [baseDir] [outDir] [mult]"
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("target/scale10x")
    val mult = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicas(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(f(df, _)).reduce(_.unionByName(_))

    // documents: content-keyed token suffixing in replicas r>0 (see
    // scaladoc); n_chars recomputed so the column stays consistent
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val docOff = docs.agg(max("doc_id")).head().getLong(0) + 1
    val bigDocs = replicas(docs) { (d, r) =>
      val text =
        if (r == 0) col("text")
        else array_join(
          transform(split(col("text"), " "),
            t => when(pmod(hash(t), lit(3)) === 0, concat(t, lit(s"~$r"))).otherwise(t)),
          " ")
      d.select(
        (col("doc_id") + lit(r * docOff)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
    }

    // embeddings: rotate the vector r positions (orthogonal: norms and
    // intra-replica dot products preserved exactly)
    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val vecOff = emb.agg(max("vec_id")).head().getLong(0) + 1
    val bigEmb = replicas(emb) { (e, r) =>
      val v = col("embedding")
      val rot =
        if (r == 0) v
        else concat(slice(v, lit(r + 1), size(v) - r), slice(v, 1, r))
      e.select((col("vec_id") + lit(r * vecOff)).as("vec_id"),
        rot.as("embedding"), col("label"))
    }

    // orders: dense key shift (base keys are dense 0..N-1, offset = N, so
    // the union is dense 0..mult·N-1 — heap provenance edges and
    // zero-padded fid ordering stay valid); metadata derives from the key,
    // so every replica's rows are genuinely distinct catalog content
    val orders = spark.read.parquet(s"$baseDir/orders.parquet")
    val ordOff = orders.agg(max("o_orderkey")).head().getLong(0) + 1
    val bigOrders = replicas(orders) { (o, r) =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(r * ordOff))
    }

    val out = java.nio.file.Paths.get(outDir).toAbsolutePath
    java.nio.file.Files.createDirectories(out)
    bigDocs.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    bigEmb.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    bigOrders.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // the rest of the star schema rides along via symlinks
    val passthrough =
      Seq("region", "nation", "customer", "supplier", "part", "lineitem", "events")
    passthrough.foreach { t =>
      val link = out.resolve(s"$t.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(baseDir, s"$t.parquet").toAbsolutePath)
    }

    println(s"SCALEDATA $outDir mult=$mult " +
      s"docs=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"emb=${spark.read.parquet(s"$out/embeddings.parquet").count()} " +
      s"orders=${spark.read.parquet(s"$out/orders.parquet").count()}")
    spark.stop()
  }
}
