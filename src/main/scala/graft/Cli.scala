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
  *
  * Further reference flags (metacat_query.py:20-41): `-i/--ids` emits file
  * ids only; `-m/--metadata <k,...|all>` controls which metadata keys are
  * emitted (absent ⇒ metadata omitted — the reference's with_meta flag);
  * `-q <file>` reads the query text from a file; `-S/--save-as ns:name`
  * and `-A/--add-to ns:name` materialize the result's membership into a
  * dataset (require `-c`, the writable catalog).
  *
  * When the first positional token is `dataset`, `namespace`, `file` or
  * `named-query`, the invocation is an ADMIN command instead (reference
  * `metacat/ui/` subcommand groups) — see [[AdminCli]]. Admin commands
  * require `-c` (they mutate or inspect the writable catalog).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var explain = false
    var includeRetired = false
    var withProvenance = false
    var idsOnly = false
    var metaKeys: Option[String] = None
    var saveAs: Option[String] = None
    var addTo: Option[String] = None
    var summary: Option[String] = None
    var catalogRoot: Option[String] = None
    var defaultNs: Option[String] = None
    var queryFile: Option[String] = None
    val mql = new StringBuilder
    var i = 0
    def operand(flag: String): String = {
      if (i + 1 >= args.length)
        throw new IllegalArgumentException(s"flag $flag requires an argument")
      i += 1; args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "-x" | "--explain" => explain = true
        case "-r" | "--include-retired" => includeRetired = true
        // metacat_query.py:49 `-P/--with-provenance`
        case "-P" | "--with-provenance" => withProvenance = true
        case "-i" | "--ids" => idsOnly = true
        case f @ ("-m" | "--metadata") => metaKeys = Some(operand(f))
        case f @ ("-S" | "--save-as") => saveAs = Some(operand(f))
        case f @ ("-A" | "--add-to") => addTo = Some(operand(f))
        case f @ ("-s" | "--summary") => summary = Some(operand(f))
        case f @ "-c" => catalogRoot = Some(operand(f))
        case f @ "-n" => defaultNs = Some(operand(f))
        case f @ "-q" => queryFile = Some(operand(f))
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
    if (AdminCli.isAdmin(args)) {
      // lazily forced (AdminCli takes it by-name): catalog-free groups
      // like dedup-store run without -c
      def writable: ParquetCatalog = cat match {
        case p: ParquetCatalog => p
        case _ => throw new IllegalArgumentException(
          "admin commands require -c <catalog-root>")
      }
      // the accumulated "query text" is really the admin argv; operand
      // flags (-m/-q/…) were consumed above only if they are ALSO query
      // flags, so re-split from the raw args minus -c/-n pairs
      val argv = {
        var j = 0; val b = List.newBuilder[String]
        while (j < args.length) {
          args(j) match {
            case "-c" | "-n" => j += 2
            case t => b += t; j += 1
          }
        }
        b.result()
      }
      AdminCli.run(spark, writable, argv)
      spark.stop()
      return
    }
    val text = queryFile match {
      case Some(f) =>
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")
      case None => mql.toString.trim
    }
    if (explain)
      println(Mql.explain(spark, cat, text, defaultNs))
    else {
      import org.apache.spark.sql.functions._
      val result0 = Mql.query(spark, cat, text, defaultNs, includeRetired)

      // -S/-A: materialize membership before printing (data_handler.py
      // save_as/add_to; both need the writable catalog)
      def didOf(s: String): (String, String) = s.split(":", 2) match {
        case Array(ns, n) => (ns, n)
        case _ => throw new IllegalArgumentException(s"expected ns:name, got $s")
      }
      if (saveAs.nonEmpty || addTo.nonEmpty) {
        val writable = cat match {
          case p: ParquetCatalog => p
          case _ => throw new IllegalArgumentException("-S/-A require -c <catalog-root>")
        }
        saveAs.map(didOf).foreach { case (ns, n) => writable.saveAs(result0, ns, n) }
        addTo.map(didOf).foreach { case (ns, n) => writable.addTo(result0, ns, n) }
      }

      val result =
        if (withProvenance) Mql.withProvenance(cat, result0) else result0
      // `--summary count|keys|key-values` parity (metacat_query.py -s)
      val out = summary match {
        case Some("count") => Mql.summaryCount(result)
        case Some("keys") => Mql.summaryKeys(result)
        case Some("key-values" | "kv") => Mql.summaryKeyValues(result)
        case Some(other) => throw new IllegalArgumentException(s"bad summary: $other")
        case None if idsOnly => result.select(col("fid")) // -i (metacat_query.py:26)
        case None =>
          // with_meta parity: metadata is emitted only when -m asks for it,
          // either whole ("all") or filtered to the listed keys
          metaKeys match {
            case None => result.drop("metadata")
            case Some("all") => result
            case Some(ks) =>
              val keys = ks.split(",").map(_.trim).filter(_.nonEmpty)
              result.withColumn("metadata",
                map_filter(
                  try_variant_get(col("metadata"), "$", "map<string,variant>"),
                  (k, _) => k.isin(keys.toIndexedSeq: _*)))
          }
      }
      JsonSeq.stream(out).foreach(print)
    }
    spark.stop()
  }
}
