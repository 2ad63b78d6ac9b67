package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst sees a
  * `FileSourceScanExec` it can push filters/projections into. Nothing is
  * cached here: at 100 TB a cache is a liability, and the per-query scans
  * below are pruned to the referenced columns automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet INT64 TIMESTAMP(NANOS) which vanilla Spark
      // rejects; read nanos as long and truncate to microseconds (same
      // truncation DuckDB applies), keeping ts a TimestampType for
      // watermarks/windows downstream.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view named after its file. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
