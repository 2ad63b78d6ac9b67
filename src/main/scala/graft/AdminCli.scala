package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.metacat.{JsonSeq, ParquetCatalog}
import graft.mql.Mql

/** Admin subcommand surface of [[Cli]] — parity with the reference's
  * `metacat dataset|namespace|file|named_query …` UI groups
  * (`metacat/ui/metacat_dataset.py:426-436`, `metacat_namespace.py:90-93`,
  * `metacat_file.py`, `metacat_named_query.py`): thin wrappers over the
  * [[ParquetCatalog]] read/write API, which already carries the full
  * handler semantics (validation, category checks, provenance upkeep).
  * Auth and GUI-only commands are out of engine scope.
  *
  * {{{
  *   graft.Cli -c <root> dataset create|show|files|list|add-subset|
  *                               add-files|remove-files|update|remove …
  *   graft.Cli -c <root> namespace create|list|show …
  *   graft.Cli -c <root> file declare|retire|update-meta|update|move|
  *                            show|datasets …
  *   graft.Cli -c <root> named-query create|show|list|search …
  *   graft.Cli -c <root> catalog fsck|compact|checkpoint|vacuum|history|pin|unpin|pins
  *   graft.Cli dedup-store stats|fsck|checkpoint|vacuum|retire <storeRoot> [ids…]
  * }}}
  */
object AdminCli {

  /** the admin group tokens; none collides with an MQL leading keyword
    * (`files`/`datasets`/`queries`/`fids`/`union`/`join`/`filter`) */
  val Groups: Set[String] =
    Set("dataset", "namespace", "file", "named-query", "catalog",
      "dedup-store")

  /** true iff the FIRST positional token (skipping `-c`/`-n` flag pairs)
    * names an admin group — the query surface is untouched otherwise */
  def isAdmin(args: Array[String]): Boolean = {
    var j = 0
    while (j < args.length) {
      args(j) match {
        case "-c" | "-n" => j += 2
        case t => return Groups(t)
      }
    }
    false
  }

  private def did(s: String): (String, String) = s.split(":", 2) match {
    case Array(ns, n) if ns.nonEmpty && n.nonEmpty => (ns, n)
    case _ => throw new IllegalArgumentException(s"expected ns:name, got $s")
  }

  private def emit(df: org.apache.spark.sql.DataFrame): Unit =
    JsonSeq.stream(df).foreach(print)

  /** `cat` is BY-NAME: only forced by commands that touch the catalog,
    * so catalog-free groups (`dedup-store`, whose store has its own
    * root) run without `-c <catalog-root>` */
  def run(spark: SparkSession, cat0: => ParquetCatalog,
      argv: List[String]): Unit = {
    lazy val cat = cat0
    // tiny flag splitter: `-f v` / `--flag v` pairs out, positionals kept
    val valueFlags = Set("-m", "-d", "-o", "-j", "-q", "--flags", "--size",
      "--parents", "--children", "--by", "--requirements", "--to")
    val boolFlags = Set("--frozen", "--monotonic", "--replace", "--dry-run")
    var flags = Map.empty[String, String]
    var pos = List.empty[String]
    var rest = argv
    while (rest.nonEmpty) {
      rest match {
        case f :: v :: t if valueFlags(f) => flags += (f -> v); rest = t
        case f :: t if boolFlags(f) => flags += (f -> "true"); rest = t
        case p :: t => pos = pos :+ p; rest = t
        case Nil => ()
      }
    }
    val replace = flags.contains("--replace")
    val by = flags.getOrElse("--by", "graft")
    def mql(words: Seq[String]): org.apache.spark.sql.DataFrame = {
      val text = flags.get("-q") match {
        case Some(f) => new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), "UTF-8")
        case None => words.mkString(" ")
      }
      Mql.query(spark, cat, text)
    }

    pos match {
      // ---- dataset (metacat_dataset.py) ----
      case "dataset" :: "create" :: d :: Nil =>
        val (ns, n) = did(d)
        cat.createDataset(ns, n, frozen = flags.contains("--frozen"),
          monotonic = flags.contains("--monotonic"), creator = by,
          metadataJson = flags.getOrElse("-m", "{}"),
          fileMetaRequirementsJson = flags.getOrElse("--requirements", null))
      case "dataset" :: "show" :: d :: Nil =>
        val (ns, n) = did(d)
        emit(cat.datasets.filter(col("namespace") === ns && col("name") === n))
      case "dataset" :: "list" :: rest0 =>
        val base = cat.datasets.orderBy("namespace", "name")
        emit(rest0 match {
          case pat :: Nil =>
            base.filter(concat(col("namespace"), lit(":"), col("name")).like(pat))
          case _ => base
        })
      case "dataset" :: "files" :: d :: Nil =>
        val (ns, n) = did(d)
        emit(Mql.query(spark, cat, s"files from $ns:$n").drop("metadata"))
      case "dataset" :: "add-subset" :: p :: c :: Nil =>
        val (pNs, pN) = did(p); val (cNs, cN) = did(c)
        cat.addDatasetEdge(pNs, pN, cNs, cN)
      case "dataset" :: "add-files" :: d :: q =>
        val (ns, n) = did(d)
        cat.addTo(mql(q), ns, n)
      case "dataset" :: "remove-files" :: d :: q =>
        val (ns, n) = did(d)
        cat.removeFrom(mql(q), ns, n)
      case "dataset" :: "update" :: d :: Nil =>
        val (ns, n) = did(d)
        // reference flags contract (metacat_dataset.py:225-231):
        // frozen | monotonic | "-" (clear both)
        val (fz, mono) = flags.get("--flags") match {
          case Some("frozen") => (Some(true), None)
          case Some("monotonic") => (None, Some(true))
          case Some("-") => (Some(false), Some(false))
          case Some(other) => throw new IllegalArgumentException(s"bad --flags $other")
          case None => (None, None)
        }
        cat.updateDataset(ns, n, metadataJson = flags.get("-m"),
          metadataMode = if (replace) "replace" else "update",
          frozen = fz, monotonic = mono, description = flags.get("-d"))
      case "dataset" :: "remove" :: d :: Nil =>
        val (ns, n) = did(d)
        cat.removeDataset(ns, n)

      // ---- namespace (metacat_namespace.py) ----
      case "namespace" :: "create" :: n :: Nil =>
        cat.createNamespace(n, owner = flags.getOrElse("-o", "graft"),
          description = flags.getOrElse("-d", null), creator = by)
      case "namespace" :: "list" :: Nil =>
        emit(cat.namespaces.orderBy("name"))
      case "namespace" :: "show" :: n :: Nil =>
        emit(cat.namespaces.filter(col("name") === n))

      // ---- file (metacat_file.py) ----
      case "file" :: "declare" :: rest0 =>
        // -j <file.json>: a JSON array of {fid, namespace, name,
        // [metadata], [size], [checksums]} (DeclareManyCommand's shape);
        // optional positional dataset ns:name receives the batch
        val jf = flags.getOrElse("-j",
          throw new IllegalArgumentException("file declare requires -j <file.json>"))
        val raw = spark.read.option("multiLine", "true").json(jf)
        def opt(c: String, t: String) =
          if (raw.columns.contains(c)) col(c).cast(t) else lit(null).cast(t)
        val rows = raw.select(
          col("fid"), col("namespace"), col("name"),
          (if (raw.columns.contains("metadata")) to_json(col("metadata"))
          else lit("{}")).as("metadata_json"),
          lit(by).as("creator"),
          current_timestamp().as("created_timestamp"),
          opt("size", "long").as("size"),
          (if (raw.columns.contains("checksums"))
            from_json(to_json(col("checksums")),
              org.apache.spark.sql.types.MapType(
                org.apache.spark.sql.types.StringType,
                org.apache.spark.sql.types.StringType))
          else lit(null).cast("map<string,string>")).as("checksums"))
        cat.declareFiles(rows, dataset = rest0.headOption.map(did),
          dryRun = flags.contains("--dry-run"))
      case "file" :: "retire" :: fids if fids.nonEmpty =>
        cat.retireFiles(fids, by = by)
      case "file" :: "update-meta" :: fids if fids.nonEmpty =>
        cat.updateFileMeta(fids, flags.getOrElse("-m",
          throw new IllegalArgumentException("update-meta requires -m <json>")),
          mode = if (replace) "replace" else "update", by = by)
      case "file" :: "update" :: fid :: Nil =>
        def list(f: String) = flags.get(f).map(_.split(",").toSeq.filter(_.nonEmpty))
        cat.updateFile(fid, metadataJson = flags.get("-m"),
          parents = list("--parents"), children = list("--children"),
          size = flags.get("--size").map(_.toLong),
          mode = if (replace) "replace" else "add-update", by = by)
      case "file" :: "move" :: fids if fids.nonEmpty =>
        cat.moveNamespace(fids, flags.getOrElse("--to",
          throw new IllegalArgumentException("file move requires --to <namespace>")), by = by)
      case "file" :: "show" :: fid :: Nil =>
        emit(cat.files.filter(col("fid") === fid))
      case "file" :: "datasets" :: fid :: Nil =>
        emit(cat.filesDatasets.filter(col("fid") === fid)
          .select(col("dataset_namespace"), col("dataset_name")).orderBy("dataset_namespace", "dataset_name"))

      // ---- named-query (metacat_named_query.py) ----
      case "named-query" :: "create" :: d :: q if q.nonEmpty || flags.contains("-q") =>
        val (ns, n) = did(d)
        val source = flags.get("-q") match {
          case Some(f) => new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f)), "UTF-8")
          case None => q.mkString(" ")
        }
        cat.saveNamedQuery(ns, n, source, creator = by)
      case "named-query" :: "show" :: d :: Nil =>
        val (ns, n) = did(d)
        cat.namedQuerySource(ns, n) match {
          case Some(src) => println(src)
          case None => throw new IllegalArgumentException(s"named query $d not found")
        }
      case "named-query" :: "list" :: Nil =>
        emit(cat.queries.select("namespace", "name", "source").orderBy("namespace", "name"))
      case "named-query" :: "search" :: pat :: Nil =>
        emit(Mql.query(spark, cat, s"queries matching $pat"))

      // ---- catalog maintenance (no reference-UI analog: the reference
      // delegates integrity to Postgres and its daemons; a lakehouse
      // catalog schedules these instead) ----
      case "catalog" :: "fsck" :: Nil =>
        emit(graft.metacat.Fsck.audit(cat).orderBy("check_name"))
      case "catalog" :: "compact" :: Nil => // EXCLUSIVE window required
        cat.compactFilesLog()
      case "catalog" :: "checkpoint" :: Nil => // concurrent-safe pair:
        println(s"""{"checkpoint_seq":${cat.checkpointFilesLog()},""" +
          s""""members_checkpoint_seq":${cat.checkpointMembersLog()},""" +
          s""""edges_checkpoint_seq":${cat.checkpointEdgesLog()},""" +
          s""""admin_checkpoint_seq":${cat.checkpointAdminLog()}}""")
      case "catalog" :: "vacuum" :: Nil => //   run on a schedule
        println(s"""{"vacuum_horizon":${cat.vacuumFilesLog()},""" +
          s""""members_vacuum_horizon":${cat.vacuumMembersLog()},""" +
          s""""edges_vacuum_horizon":${cat.vacuumEdgesLog()},""" +
          s""""admin_vacuum_horizon":${cat.vacuumAdminLog()}}""")
      case "catalog" :: "history" :: Nil =>
        emit(cat.logHistory())

      // ---- snapshot pins: capture the current version under a name;
      // vacuum/compaction refuse to destroy a pinned version's history
      // (append --force to the maintenance commands to override) ----
      case "catalog" :: "pin" :: name :: Nil =>
        val v = cat.snapshot()
        cat.pin(name, v)
        println(s"""{"pin":"$name","files":${v.files},"members":${v.members},""" +
          s""""edges":${v.edges},"admin":${v.admin}}""")
      case "catalog" :: "unpin" :: name :: Nil =>
        println(s"""{"unpinned":${cat.unpin(name)}}""")
      case "catalog" :: "pins" :: Nil =>
        cat.pins().sortBy(_._1).foreach { case (n, v) =>
          println(s"""{"pin":"$n","files":${v.files},"members":${v.members},""" +
            s""""edges":${v.edges},"admin":${v.admin}}""")
        }
      case "catalog" :: "compact" :: "--force" :: Nil =>
        cat.compactFilesLog(force = true)
      case "catalog" :: "vacuum" :: "--force" :: Nil =>
        println(s"""{"vacuum_horizon":${cat.vacuumFilesLog(force = true)},""" +
          s""""members_vacuum_horizon":${cat.vacuumMembersLog(force = true)},""" +
          s""""edges_vacuum_horizon":${cat.vacuumEdgesLog(force = true)},""" +
          s""""admin_vacuum_horizon":${cat.vacuumAdminLog(force = true)}}""")

      // ---- OCC dedup store maintenance (graft.metacat.DedupLog) — the
      // store has its OWN root (it is pipeline state, not catalog
      // metadata), passed positionally ----
      case "dedup-store" :: "stats" :: sroot :: Nil =>
        val dl = new graft.metacat.DedupLog(spark, sroot)
        println(s"""{"corpus_docs":${dl.corpus().count()},""" +
          s""""index_rows":${dl.index().count()}}""")
      case "dedup-store" :: "fsck" :: sroot :: Nil =>
        emit(new graft.metacat.DedupLog(spark, sroot).fsck().orderBy("check"))
      case "dedup-store" :: "checkpoint" :: sroot :: Nil =>
        println(s"""{"checkpoint_seq":${
          new graft.metacat.DedupLog(spark, sroot).checkpoint()}}""")
      case "dedup-store" :: "vacuum" :: sroot :: Nil =>
        println(s"""{"vacuum_horizon":${
          new graft.metacat.DedupLog(spark, sroot).vacuum()}}""")
      case "dedup-store" :: "retire" :: sroot :: ids if ids.nonEmpty =>
        new graft.metacat.DedupLog(spark, sroot).retire(ids.map(_.toLong))
        println(s"""{"retired":${ids.length}}""")

      case other =>
        throw new IllegalArgumentException(
          s"unknown admin command: ${other.mkString(" ")}")
    }
  }
}
