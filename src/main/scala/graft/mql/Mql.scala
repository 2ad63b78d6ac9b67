package graft.mql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.metacat.MetacatCatalog
import Ast._

/** Public entry point of the MQL engine: MQL text → DataFrame.
  *
  * Lifecycle (SURVEY.md §3): parse ([[MqlParser]]) → resolve/normalize
  * ([[Rewrites]]) → plan to DataFrame ([[Planner]]) → Catalyst
  * analyze/optimize/execute. The reference's steps 4-6 (its own optimizer,
  * SQL generation, generator execution, `metacat/mql/mql10.py:127-183`,
  * `sql_converter.py`, `query_executor.py`) collapse into Catalyst.
  */
object Mql {

  def parse(text: String, catalog: MetacatCatalog,
      defaultNamespace: Option[String] = None): TopQ =
    Rewrites.resolve(MqlParser.parseTop(text),
      (ns, n) => catalog.namedQuerySource(ns, n), defaultNamespace)

  /** run an MQL query (file, dataset or named-query search) */
  def query(spark: SparkSession, catalog: MetacatCatalog, text: String,
      defaultNamespace: Option[String] = None,
      includeRetired: Boolean = false): DataFrame =
    new Planner(spark, catalog, includeRetired)
      .plan(parse(text, catalog, defaultNamespace))

  // ---- summary surface (SURVEY.md §2.6; dbobjects2.py:347-410) ----

  /** `summary=count`: count(*), sum(size) */
  def summaryCount(fileSet: DataFrame): DataFrame =
    fileSet.agg(count(lit(1)).as("count"),
      coalesce(sum(col("size")), lit(0L)).as("total_size"))

  /** `summary=keys`: distinct top-level metadata keys, sorted
    * (jsonb_object_keys, dbobjects2.py:367-388) */
  def summaryKeys(fileSet: DataFrame): DataFrame =
    fileSet
      .select(explode(map_keys(
        try_variant_get(col("metadata"), "$", "map<string,variant>"))).as("key"))
      .distinct()
      .orderBy("key")

  /** `summary=key-values`: distinct (key, value-as-json) pairs
    * (jsonb_each, dbobjects2.py:390-410) */
  def summaryKeyValues(fileSet: DataFrame): DataFrame =
    fileSet
      .select(explode(try_variant_get(col("metadata"), "$", "map<string,variant>")))
      .select(col("key"), to_json(col("value")).as("value"))
      .distinct()
      .orderBy("key", "value")

  /** per-dataset file counts + total size — the reference maintains these
    * as daemon-refreshed denormalized columns (`daemon/daemon.py:44-58`,
    * `schema.sql:48,114`); at our scale one aggregation computes them on
    * demand (or as a periodic refresh job writing back to the catalog). */
  def datasetCounts(catalog: graft.metacat.MetacatCatalog,
      includeRetired: Boolean = false): DataFrame = {
    val f0 = catalog.files
    val f = if (includeRetired) f0 else f0.filter(!col("retired"))
    val fileAgg = catalog.filesDatasets
      .join(f.select(col("fid"), col("size")), Seq("fid"))
      .groupBy(col("dataset_namespace"), col("dataset_name"))
      .agg(count(lit(1)).as("file_count"), sum(col("size")).as("total_size"))
    // parent/child dataset counts (dbobjects2.py:1669-1677)
    val edges = catalog.datasetsParentChild
    val childCounts = edges.groupBy(
      col("parent_namespace").as("dataset_namespace"),
      col("parent_name").as("dataset_name"))
      .agg(count(lit(1)).as("child_count"))
    val parentCounts = edges.groupBy(
      col("child_namespace").as("dataset_namespace"),
      col("child_name").as("dataset_name"))
      .agg(count(lit(1)).as("parent_count"))
    fileAgg
      .join(childCounts, Seq("dataset_namespace", "dataset_name"), "left")
      .join(parentCounts, Seq("dataset_namespace", "dataset_name"), "left")
      .na.fill(0L, Seq("child_count", "parent_count"))
  }

  /** `with_provenance` projection: attach per-row `parents`/`children`
    * fid-array columns to a file result — the reference's
    * `files_with_provenance` view (`metacat/db/schema.sql:86-97`, emitted
    * by `dbobjects2.py:252-255`, CLI `-P` in `metacat/ui/metacat_query.py:49`).
    *
    * Scale shape: the edge table is first SEMI-joined to the result's fid
    * set (broadcast when the result is selective — AQE decides), so only
    * relevant edges reach the two aggregations; each aggregation is one
    * shuffle on the hop key with map-side partial `collect_list`. Arrays
    * are sorted for a canonical, engine-portable order (Postgres
    * `array(subselect)` order is unspecified; we pin it). Files with no
    * edges get empty arrays, like the view's `array(...)`. */
  def withProvenance(catalog: MetacatCatalog, fileSet: DataFrame): DataFrame = {
    val pc = catalog.parentChild
    val fids = fileSet.select("fid")
    val parents = pc
      .join(fids.withColumnRenamed("fid", "child_fid"), Seq("child_fid"), "left_semi")
      .groupBy(col("child_fid").as("fid"))
      .agg(sort_array(collect_list("parent_fid")).as("parents"))
    val children = pc
      .join(fids.withColumnRenamed("fid", "parent_fid"), Seq("parent_fid"), "left_semi")
      .groupBy(col("parent_fid").as("fid"))
      .agg(sort_array(collect_list("child_fid")).as("children"))
    fileSet
      .join(parents, Seq("fid"), "left")
      .join(children, Seq("fid"), "left")
      .withColumn("parents", coalesce(col("parents"), array().cast("array<string>")))
      .withColumn("children", coalesce(col("children"), array().cast("array<string>")))
  }

  /** Transitive provenance closure — engine extension beyond the
    * reference's one-hop `parents()`/`children()` (sql_converter.py has
    * no recursive hop): every proper ancestor (or descendant) of the
    * seed set with its MINIMUM hop distance — the "what fed this
    * dataset" / "what was derived from this file" lineage query.
    *
    * BFS frontier loop (Spark pre-4.x has no recursive CTE, same posture
    * as the dataset-DAG closure in [[Planner]]): each round joins the
    * frontier to the edge table, drops already-visited fids, emits the
    * rest at the current depth — first-reach IS min-depth because BFS
    * explores by increasing distance. Cycle-safe via the visited set;
    * `maxDepth` caps pathological graphs. A seed reached from another
    * seed appears like any other proper ancestor.
    *
    * Scale shape: the edge table is catalog-sized but only its two fid
    * columns move; each round is one narrow equi-join + anti-join, the
    * frontier is localCheckpointed so plan lineage stays flat, and round
    * count is the graph DEPTH (log-ish for real provenance DAGs), not
    * its size. */
  def provenanceClosure(catalog: MetacatCatalog, seeds: DataFrame,
      ancestors: Boolean = true, maxDepth: Int = 25): DataFrame = {
    val spark = seeds.sparkSession
    // materialized ONCE per closure: every BFS round joins this frame, and
    // without the checkpoint each round re-scanned the edge table and
    // re-computed the projection (depth × full-scan cost; r14 guide §2.4 —
    // the narrow two-column frame is the right thing to keep hot)
    val edges =
      (if (ancestors)
        catalog.parentChild.select(col("child_fid").as("src"), col("parent_fid").as("dst"))
      else
        catalog.parentChild.select(col("parent_fid").as("src"), col("child_fid").as("dst"))
      ).localCheckpoint(eager = true)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fid",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("depth",
          org.apache.spark.sql.types.LongType, nullable = false))))
    var result = empty
    var visited = seeds.select("fid").distinct().localCheckpoint(eager = true)
      .limit(0) // visited starts EMPTY: seeds are re-emittable as ancestors
    var frontier = seeds.select("fid").distinct().localCheckpoint(eager = true)
    var depth = 0
    // probe emptiness on the already-materialized checkpoint (reads
    // cached blocks, no fresh traversal). Keeping `visited` as ONE
    // re-materialized frame per round is deliberate: a growing union of
    // per-round frames makes the anti-join's plan (and AQE re-planning)
    // grow with depth — measured slower at sf0.1 despite the saved job.
    var frontierNonEmpty = frontier.limit(1).collect().nonEmpty
    while (depth < maxDepth && frontierNonEmpty) {
      depth += 1
      val next = edges
        .join(frontier.withColumnRenamed("fid", "src"), Seq("src"), "left_semi")
        .select(col("dst").as("fid")).distinct()
        .join(visited, Seq("fid"), "left_anti")
        .localCheckpoint(eager = true)
      frontierNonEmpty = next.limit(1).collect().nonEmpty
      result = result.unionByName(next.withColumn("depth", lit(depth.toLong)))
      visited = visited.unionByName(next).localCheckpoint(eager = true)
      frontier = next
    }
    result
  }

  /** Namespace-level rollup of file counts and sizes — the reference keeps
    * a denormalized `file_count` on namespaces (`schema.sql:48`) and serves
    * counts as estimates by default (`dbobjects2.py:1345-1359` reads the
    * DB planner's row estimate; `webserver/data_handler.py:190-231` exposes
    * `exact=yes|no`).
    *
    * `exact = true` filters live rows and aggregates count + total size
    * (one shuffle, map-side partial). `exact = false` mirrors the
    * reference's statistics estimate: a raw per-namespace row count with
    * NO predicate (the DB estimate counts all tuples, retired included) —
    * on a namespace-partitioned parquet layout this is answered from file
    * footers alone, no data scan — and no size sum (the estimate endpoint
    * returns counts only). */
  def namespaceCounts(catalog: graft.metacat.MetacatCatalog,
      includeRetired: Boolean = false, exact: Boolean = true): DataFrame = {
    if (exact) {
      val f0 = catalog.files
      val f = if (includeRetired) f0 else f0.filter(!col("retired"))
      val counts = f.groupBy(col("namespace"))
        .agg(count(lit(1)).as("file_count"), sum(col("size")).as("total_size"))
      // drive from the namespace DIMENSION (broadcastable, schema.sql:35-49)
      // so ownership rides along and file-less namespaces still appear —
      // UNIONed with the file-derived namespaces so files declared into a
      // namespace missing from the dimension (a writable catalog where
      // declare does not auto-register) never vanish from the exact count
      val dim = catalog.namespaces
        .select(col("name").as("namespace"), col("owner_user"))
      val allNs = dim.unionByName(
        counts.select(col("namespace"))
          .join(dim.select("namespace"), Seq("namespace"), "left_anti")
          .withColumn("owner_user", lit(null).cast("string")))
      allNs
        .join(counts, Seq("namespace"), "left")
        .select(col("namespace"), col("owner_user"),
          coalesce(col("file_count"), lit(0L)).as("file_count"),
          coalesce(col("total_size"), lit(0L)).as("total_size"),
          lit(true).as("exact"))
    } else catalog.namespaceCountsStored match {
      // daemon-refreshed denormalized counts: no files scan at all — the
      // true 100 TB estimate path (the reference answers from the
      // namespaces.file_count column the daemon maintains)
      case Some(stored) =>
        stored.select(col("namespace"), col("file_count"),
          lit(null).cast("long").as("total_size"), lit(false).as("exact"))
      case None =>
        catalog.files.groupBy(col("namespace"))
          .agg(count(lit(1)).as("file_count"),
            lit(null).cast("long").as("total_size"), lit(false).as("exact"))
    }
  }

  /** `datasets_for_files` (webserver/data_handler.py:573-607,
    * `DBDataset.datasets_for_files`): for each file of a file set, the
    * datasets it belongs to — one row per (file, dataset) membership.
    * One narrow equi-join against the membership table; the fid set is
    * usually selective, so AQE broadcasts it. */
  def datasetsForFiles(catalog: MetacatCatalog, fileSet: DataFrame): DataFrame =
    fileSet.select("fid")
      .join(catalog.filesDatasets, Seq("fid"))
      .select(col("fid"), col("dataset_namespace"), col("dataset_name"))

  /** CLI `-x/--explain` parity (metacat_query.py:64-84): the three IRs —
    * parsed AST, resolved AST, Spark physical plan. */
  def explain(spark: SparkSession, catalog: MetacatCatalog, text: String,
      defaultNamespace: Option[String] = None): String = {
    val parsed = MqlParser.parseTop(text)
    val resolved = Rewrites.resolve(parsed,
      (ns, n) => catalog.namedQuerySource(ns, n), defaultNamespace)
    val df = new Planner(spark, catalog).plan(resolved)
    s"""-- parsed --
       |$parsed
       |-- resolved --
       |$resolved
       |-- spark plan --
       |${df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)}
       |""".stripMargin
  }
}
