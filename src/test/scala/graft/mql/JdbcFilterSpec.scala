package graft.mql

import org.apache.spark.sql.functions._
import graft.metacat.DerivedCatalog

/** The concrete JDBC connector ([[JdbcLookupFilter]]) must behave
  * identically to the in-process [[Filters.LookupJoinFilter]] over the
  * same lookup rows — the external database is an implementation detail
  * of WHERE the dimension lives, never of the merge semantics. */
class JdbcFilterSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new DerivedCatalog(spark, dir)

  private def enriched(df: org.apache.spark.sql.DataFrame) =
    df.select(col("fid"),
      expr("try_variant_get(metadata, \"$['run.n_name']\", 'string')").as("nm"))
      .orderBy("fid").collect().map(r => (r.getString(0), r.getString(1))).toList

  test("conf-loaded JDBC lookup ≡ in-process LookupJoinFilter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-derby-spec-")
    graft.TempDirs.register(tmp)
    System.setProperty("derby.system.home", tmp.toString)
    val url = s"jdbc:derby:$tmp/db;create=true"
    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("int").as("nkey"), col("n_name"))
    nation.write.mode("overwrite").jdbc(url, "runsdb", props)

    spark.conf.set("spark.graft.filters", "runsdb=graft.mql.JdbcLookupFilter")
    spark.conf.set("spark.graft.filter.jdbc.url", url)
    spark.conf.set("spark.graft.filter.jdbc.driver", "org.apache.derby.jdbc.EmbeddedDriver")
    spark.conf.set("spark.graft.filter.jdbc.table", "runsdb")
    spark.conf.set("spark.graft.filter.jdbc.keyColumn", "nkey")
    spark.conf.set("spark.graft.filter.jdbc.metaKey", "core.run")
    spark.conf.set("spark.graft.filter.jdbc.prefix", "run")
    try {
      val viaJdbc = Mql.query(spark, cat,
        "filter runsdb()(files from dsns:ds2 where core.run < 60)")

      Filters.register("direct_nation", new Filters.LookupJoinFilter(
        nation.withColumnRenamed("nkey", "key"), "core.run", "run"))
      val direct = Mql.query(spark, cat,
        "filter direct_nation()(files from dsns:ds2 where core.run < 60)")

      val got = enriched(viaJdbc)
      assert(got.nonEmpty && got == enriched(direct))
      // left-join semantics: nation keys stop at 24, runs 25..59 pass
      // through unenriched — both present, neither dropped
      assert(got.exists(_._2 != null) && got.exists(_._2 == null))
    } finally {
      Seq("spark.graft.filters", "spark.graft.filter.jdbc.url",
        "spark.graft.filter.jdbc.driver", "spark.graft.filter.jdbc.table",
        "spark.graft.filter.jdbc.keyColumn", "spark.graft.filter.jdbc.metaKey",
        "spark.graft.filter.jdbc.prefix").foreach(spark.conf.unset)
    }
  }

  test("missing conf fails fast with the key name") {
    spark.conf.set("spark.graft.filters", "jdbcq=graft.mql.JdbcLookupFilter")
    try {
      val e = intercept[IllegalArgumentException](
        Mql.query(spark, cat, "filter jdbcq()(files from dsns:ds1)").count())
      assert(e.getMessage.contains("spark.graft.filter.jdbc.url"))
    } finally spark.conf.unset("spark.graft.filters")
  }
}
