package graft.metacat

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** fid-bucketed storage for the big catalog tables.
  *
  * Every multi-table operator in the engine joins on `fid` (BFQ
  * membership semi-join, union dedup, intersect/minus, provenance hops).
  * Bucketing `files`, `files_datasets` and `parent_child` by fid makes all
  * of them co-located: Spark plans a sort-merge join over matching buckets
  * with NO shuffle exchange on either side — at 100 TB that removes the
  * dominant network cost of the catalog workload. This is the managed-
  * table analog of the reference's btree-on-id + PK layout
  * (`schema.sql:53,77-84`).
  *
  * Tables are registered in the session catalog (`db`.files etc.);
  * [[catalog]] returns a MetacatCatalog reading them.
  */
object Bucketing {

  /** `buckets <= 0` writes the same managed tables UNBUCKETED — the
    * control arm for layout A/Bs (same storage medium, only the layout
    * differs; comparing against a session-cached source conflates layout
    * with medium). */
  def writeBucketed(spark: SparkSession, source: MetacatCatalog, db: String,
      buckets: Int = 16): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // idempotent: drop the table AND any orphaned location from a previous
    // JVM (the default metastore is per-session, the warehouse dir is not)
    def reset(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $db.$name")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val loc = new java.io.File(s"$warehouse/$db.db/$name")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      if (loc.exists()) rm(loc)
    }
    def save(df: DataFrame, name: String, bucketCol: String): Unit = {
      reset(name)
      // co-partition the WRITE with the bucket function: without this,
      // every one of the N input partitions spills rows into every
      // bucket — N×buckets small files whose scan overhead eats the
      // join savings. One shuffle at layout time buys 1 file per bucket.
      val data =
        if (buckets > 0)
          df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
        else df
      val w = data.write.mode(SaveMode.Overwrite)
      (if (buckets > 0) w.bucketBy(buckets, bucketCol).sortBy(bucketCol) else w)
        .saveAsTable(s"$db.$name")
    }
    // Variant is engine-internal; store metadata as JSON text
    import org.apache.spark.sql.functions._
    def saveDim(df: DataFrame, name: String): Unit = {
      reset(name)
      df.write.mode(SaveMode.Overwrite).saveAsTable(s"$db.$name")
    }
    save(source.files.withColumn("metadata", to_json(col("metadata"))), "files", "fid")
    save(source.filesDatasets, "files_datasets", "fid")
    save(source.parentChild.withColumn("fid", col("child_fid")), "parent_child", "fid")
    saveDim(source.datasets.withColumn("metadata", to_json(col("metadata"))), "datasets")
    saveDim(source.datasetsParentChild, "datasets_parent_child")
    saveDim(source.queries.withColumn("metadata", to_json(col("metadata"))), "queries")
  }

  /** catalog over the bucketed tables. Pass the source catalog's
    * `shredding` so metadata predicates keep compiling to the typed shred
    * columns (they ride along in the bucketed files table) instead of
    * re-parsing JSON per query. */
  def catalog(spark: SparkSession, db: String,
      shred: Map[String, (String, graft.mql.MetaCompiler.ShredType)] = Map.empty)
      : MetacatCatalog = new MetacatCatalog {
    import org.apache.spark.sql.functions._
    private def t(n: String) = spark.table(s"$db.$n")
    override def shredding: Map[String, (String, graft.mql.MetaCompiler.ShredType)] =
      shred
    override def files: DataFrame =
      t("files").withColumn("metadata", parse_json(col("metadata")))
    override def filesDatasets: DataFrame = t("files_datasets")
    override def datasets: DataFrame =
      t("datasets").withColumn("metadata", parse_json(col("metadata")))
    override def parentChild: DataFrame = t("parent_child").drop("fid")
    override def datasetsParentChild: DataFrame = t("datasets_parent_child")
    override def queries: DataFrame =
      t("queries").withColumn("metadata", parse_json(col("metadata")))
    override def namedQuerySource(ns: String, n: String): Option[String] =
      t("queries").filter(col("namespace") === ns && col("name") === n)
        .select("source").collect().headOption.map(_.getString(0))
  }
}
