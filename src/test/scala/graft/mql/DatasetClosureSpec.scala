package graft.mql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.metacat.MetacatCatalog

/** Dataset-DAG closure corner cases: cycles must terminate (the reference
  * guards with path arrays, dbobjects2.py:1061-1088; we use a visited
  * set), diamonds must not duplicate. */
class DatasetClosureSpec extends SparkTestBase {

  /** catalog with datasets a->b->c->a (cycle) and x->{y,z}->w (diamond) */
  private lazy val cyclic: MetacatCatalog = new MetacatCatalog {
    private val s: SparkSession = spark
    import s.implicits._
    override lazy val files: DataFrame =
      new TinyCatalog(s, Seq(("f1", "{}"))).files
    override lazy val filesDatasets: DataFrame =
      Seq(("f1", "t", "a")).toDF("fid", "dataset_namespace", "dataset_name")
    override lazy val datasets: DataFrame =
      Seq("a", "b", "c", "x", "y", "z", "w").toDF("name").select(
        lit("t").as("namespace"), col("name"),
        lit(false).as("frozen"), lit(false).as("monotonic"),
        lit("u").as("creator"),
        to_timestamp(lit("2020-01-01 00:00:00")).as("created_timestamp"),
        lit("").as("description"),
        parse_json(lit("{}")).as("metadata"),
        lit(null).cast("long").as("file_count"))
    override lazy val parentChild: DataFrame =
      Seq.empty[(String, String)].toDF("parent_fid", "child_fid")
    override lazy val datasetsParentChild: DataFrame =
      Seq(("a", "b"), ("b", "c"), ("c", "a"), // cycle
        ("x", "y"), ("x", "z"), ("y", "w"), ("z", "w")) // diamond
        .toDF("pn", "cn")
        .select(lit("t").as("parent_namespace"), col("pn").as("parent_name"),
          lit("t").as("child_namespace"), col("cn").as("child_name"))
    override lazy val queries: DataFrame =
      Seq.empty[(String, String, String)].toDF("namespace", "name", "source")
        .select(col("namespace"), col("name"), col("source"),
          lit("u").as("creator"),
          to_timestamp(lit("2020-01-01 00:00:00")).as("created_timestamp"),
          parse_json(lit("{}")).as("metadata"))
    override def namedQuerySource(ns: String, n: String): Option[String] = None
  }

  test("recursive closure terminates on a cycle and returns each dataset once") {
    val got = Mql.query(spark, cyclic, "datasets t:a with subsets recursively")
      .select("name").orderBy("name").collect().map(_.getString(0)).toList
    assert(got == List("a", "b", "c"))
  }

  test("diamond hierarchy yields each descendant once") {
    val got = Mql.query(spark, cyclic, "datasets t:x with subsets recursively")
      .select("name").orderBy("name").collect().map(_.getString(0)).toList
    assert(got == List("w", "x", "y", "z"))
  }

  test("one-level subsets on the cycle") {
    val got = Mql.query(spark, cyclic, "datasets t:c with subsets")
      .select("name").orderBy("name").collect().map(_.getString(0)).toList
    assert(got == List("a", "c"))
  }
}
