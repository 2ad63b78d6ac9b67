package graft.mql

import graft.metacat.DerivedCatalog
import org.apache.spark.sql.functions._

/** MQL-over-`spark.sql` passthrough: every MQL statement shape must plan
  * identically through `spark.sql(text)` and `Mql.query(text)`, and plain
  * SQL must reach Spark's own parser untouched. */
class MqlSqlPassthroughSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new DerivedCatalog(spark, dir)

  // one statement per top-level grammar production (the golden corpus of
  // MqlEngineSpec, abbreviated to the distinct leaders)
  private val corpus = Seq(
    "files from dsns:ds1 where core.run < 300",
    "files from dsns:ds1, dsns:ds2 where core.run < 400",
    "fids F00000003, F00000097, F00000101, F00000202 skip 1 limit 2",
    "datasets matching dsns:* having ds.index >= 0",
    "queries matching q:* where q.owner == admin",
    "union(files from dsns:ds1 where core.run < 200, files from dsns:ds2 where core.run < 200)",
    "{files from dsns:all where core.run < 600, files from dsns:ds2}",
    "files from dsns:ds0 - files where core.run >= 500",
    "filter sample(0.25)(files from dsns:ds1)",
    "parents(files from dsns:ds2 where core.run < 100)",
    "children(files from dsns:ds1 where core.run < 100)")

  test("every MQL leader plans identically via spark.sql") {
    MqlSql.install(spark, cat)
    for (q <- corpus) {
      val viaSql = spark.sql(q)
      val viaApi = Mql.query(spark, cat, q)
      assert(viaSql.columns.sameElements(viaApi.columns), s"schema diverged for: $q")
      // row-level multiset compare (the two plans share relation expr-ids,
      // so combining them in one exceptAll plan would force dedup rewrites)
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.drop("metadata", "checksums").collect().map(_.toString).toSeq.sorted
      assert(rows(viaSql) == rows(viaApi), s"result diverged for: $q")
    }
  }

  test("plain SQL is delegated untouched; MQL errors stay MQL errors") {
    MqlSql.install(spark, cat)
    assert(spark.sql("SELECT count(*) AS n FROM range(10)").head().getLong(0) == 10L)
    // an MQL leader with bad syntax surfaces the MQL parser's message,
    // not a baffling SQL one
    val ex = intercept[Exception](spark.sql("files frum dsns:ds1"))
    assert(!ex.getMessage.toUpperCase.contains("SQLSTATE"),
      s"expected an MQL error, got a SQL one: ${ex.getMessage}")
  }

  test("uninstalled catalog fails with the install hint") {
    val fresh = spark.newSession()
    val ex = intercept[IllegalStateException](fresh.sql("files from a:b"))
    assert(ex.getMessage.contains("MqlSql.install"))
  }

  test("native functions are callable from SQL in the same session") {
    assert(spark.sql("SELECT graft_adler32('ABCD') AS h").head().getLong(0) ==
      { val a = new java.util.zip.Adler32; a.update("ABCD".getBytes); a.getValue })
  }
}
