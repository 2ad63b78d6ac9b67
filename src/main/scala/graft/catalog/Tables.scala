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
      // events.ts encoding varies by producer (INT64 nanos vs timestamp[us]
      // NTZ vs UTC-adjusted); EventsReader branches on the actual footer
      // type and normalizes ts to TimestampType.
      EventsReader.readBatch(spark, s"$dir/$name.parquet")
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view named after its file. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
