package graft

import org.apache.spark.sql.SparkSession
import graft.metacat.{DerivedCatalog, JsonSeq, MetacatCatalog, ParquetCatalog}
import graft.mql.Mql

/** Command-line MQL runner — the `metacat query` parity surface
  * (`metacat/ui/metacat_query.py:44-169`):
  *
  * {{{
  *   sbt "runMain graft.Cli [-x] [-c <catalog-root>] [-n <default-ns>] <mql...>"
  * }}}
  *
  * `-x/--explain` prints the three IRs (parsed AST → resolved AST → Spark
  * physical plan) without executing, like the reference's client-side
  * explain. By default results stream to stdout as RS-delimited json-seq
  * (the reference's wire format). `-c` points at a ParquetCatalog root;
  * without it the demo catalog derived from `SPARK_GRAFT_SF_DIR` is used.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var explain = false
    var includeRetired = false
    var withProvenance = false
    var summary: Option[String] = None
    var catalogRoot: Option[String] = None
    var defaultNs: Option[String] = None
    val mql = new StringBuilder
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-x" | "--explain" => explain = true
        case "-r" | "--include-retired" => includeRetired = true
        // metacat_query.py:49 `-P/--with-provenance`
        case "-P" | "--with-provenance" => withProvenance = true
        case "-s" | "--summary" => summary = Some(args(i + 1)); i += 1
        case "-c" => catalogRoot = Some(args(i + 1)); i += 1
        case "-n" => defaultNs = Some(args(i + 1)); i += 1
        case other => mql.append(other).append(' ')
      }
      i += 1
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cat: MetacatCatalog = catalogRoot match {
      case Some(root) => new ParquetCatalog(spark, root)
      case None => new DerivedCatalog(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    }
    val text = mql.toString.trim
    if (explain)
      println(Mql.explain(spark, cat, text, defaultNs))
    else {
      val result0 = Mql.query(spark, cat, text, defaultNs, includeRetired)
      val result =
        if (withProvenance) Mql.withProvenance(cat, result0) else result0
      // `--summary count|keys|key-values` parity (metacat_query.py -s)
      val out = summary match {
        case Some("count") => Mql.summaryCount(result)
        case Some("keys") => Mql.summaryKeys(result)
        case Some("key-values" | "kv") => Mql.summaryKeyValues(result)
        case Some(other) => throw new IllegalArgumentException(s"bad summary: $other")
        case None => result
      }
      JsonSeq.stream(out).foreach(print)
    }
    spark.stop()
  }
}
