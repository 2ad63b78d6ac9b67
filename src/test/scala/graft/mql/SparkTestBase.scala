package graft.mql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.metacat.MetacatCatalog

trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkTestBase.session

  override def afterAll(): Unit = () // keep the shared session across suites
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the engine's session posture: native SQL functions + the MQL
    // passthrough parser (exercised by MqlSqlPassthroughSpec)
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .appName("graft-test")
    .getOrCreate()
}

/** Tiny handcrafted catalog for semantics golden tests: one file per
  * (fid, metadata-JSON) pair, all in dataset t:d. */
final class TinyCatalog(spark: SparkSession, fileMeta: Seq[(String, String)])
    extends MetacatCatalog {
  import spark.implicits._

  override lazy val files: DataFrame =
    fileMeta.toDF("fid_", "mj").select(
      col("fid_").as("fid"),
      lit("t").as("namespace"),
      concat(col("fid_"), lit(".dat")).as("name"),
      parse_json(col("mj")).as("metadata"),
      lit("u").as("creator"),
      to_timestamp(lit("2020-06-01 12:00:00")).as("created_timestamp"),
      lit(100L).as("size"),
      map(lit("md5"), md5(col("fid_"))).as("checksums"),
      lit("u").as("updated_by"),
      to_timestamp(lit("2020-06-01 12:00:00")).as("updated_timestamp"),
      lit(false).as("retired"),
      lit(null).cast("timestamp").as("retired_timestamp"),
      lit(null).cast("string").as("retired_by"))

  override lazy val filesDatasets: DataFrame =
    fileMeta.map(_._1).toDF("fid").select(col("fid"),
      lit("t").as("dataset_namespace"), lit("d").as("dataset_name"))

  override lazy val datasets: DataFrame =
    Seq(("t", "d")).toDF("namespace", "name").select(
      col("namespace"), col("name"),
      lit(false).as("frozen"), lit(false).as("monotonic"),
      lit("u").as("creator"),
      to_timestamp(lit("2020-01-01 00:00:00")).as("created_timestamp"),
      lit("").as("description"),
      parse_json(lit("{}")).as("metadata"),
      lit(null).cast("long").as("file_count"))

  override lazy val parentChild: DataFrame =
    Seq.empty[(String, String)].toDF("parent_fid", "child_fid")

  override lazy val datasetsParentChild: DataFrame =
    Seq.empty[(String, String, String, String)]
      .toDF("parent_namespace", "parent_name", "child_namespace", "child_name")

  override lazy val queries: DataFrame =
    Seq.empty[(String, String, String)].toDF("namespace", "name", "source")
      .select(col("namespace"), col("name"), col("source"),
        lit("u").as("creator"),
        to_timestamp(lit("2020-01-01 00:00:00")).as("created_timestamp"),
        parse_json(lit("{}")).as("metadata"))

  override def namedQuerySource(namespace: String, name: String): Option[String] = None
}
