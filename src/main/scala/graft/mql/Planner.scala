package graft.mql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.metacat.MetacatCatalog
import Ast._

/** Translates a resolved MQL AST into a DataFrame (= Catalyst LogicalPlan).
  *
  * Design (SURVEY.md §2, §4): every operator is expressed with declarative
  * DataFrame ops so Catalyst performs the pushdown/pruning the reference
  * implements by hand (`_MetaExpPusher`, `_QueryOptionsApplier`,
  * `SQLConverter` coalescing). Scale notes:
  *
  *  - BFQ dataset membership runs as two LEFT SEMI joins:
  *    `files ⋉ (files_datasets ⋉ broadcast(selected datasets))`.
  *    The dataset selector is a broadcast (dimension-sized); the semi join
  *    on `fid` both avoids row duplication (the reference needs DISTINCT
  *    for multi-dataset scans, `dbobjects2.py:283`) and keeps the plan a
  *    single shuffle on fid at worst; with the files table bucketed by
  *    `fid` it is shuffle-free.
  *  - `join()` (intersection) = chained left-semi on fid; `minus` =
  *    left-anti; `union` = unionByName + dropDuplicates(fid) — the id-set
  *    materialization of the reference (`dbobjects2.py:169-204`) becomes
  *    distributed hash joins.
  *  - provenance hops are semi joins through the edge table in the proper
  *    direction (reverse index `schema.sql:77-84` ≈ shuffle on the join
  *    key).
  *  - `ordered`/`skip`/`limit` follow the reference: order is always by
  *    file id (`sql_converter.py:75-91`), skip implies ordered
  *    (docs/mql.rst:832-850). A global sort before offset is the price of
  *    reference semantics; plans that don't paginate never sort.
  */
final class Planner(spark: SparkSession, catalog: MetacatCatalog,
    includeRetired: Boolean = false) {

  import Planner._

  def plan(top: TopQ): DataFrame = top match {
    case TopFileQ(q) => planFile(q)
    case TopDatasetQ(sels) => planDatasetQuery(sels)
    case TopQueryQ(pat, where) => planQueryQuery(pat, where)
  }

  // ---------- file queries ----------

  def planFile(q: FileQ): DataFrame = q match {
    case Bfq(sels, where, skip, limit, ordered) =>
      var df = catalog.files
      if (sels.nonEmpty) {
        val members = catalog.filesDatasets
          .join(broadcast(datasetNames(sels)),
            Seq("dataset_namespace", "dataset_name"), "left_semi")
        df = df.join(members, Seq("fid"), "left_semi")
      }
      if (!includeRetired) df = df.filter(!col("retired"))
      where.foreach(w => df = df.filter(filePred(df, w)))
      page(df, skip, limit, ordered)

    case FileListQ(dids, fids, skip, limit) =>
      val base = catalog.files
      val byId =
        if (fids.nonEmpty) base.filter(col("fid").isin(fids: _*))
        else {
          val pairs = dids.map { case (ns, n) => s"${ns.get}:$n" }
          base.filter(concat(col("namespace"), lit(":"), col("name")).isin(pairs: _*))
        }
      // file lists are always id-ordered (dbobjects2.py:306-345)
      page(byId, skip, limit, ordered = true)

    case UnionQ(qs) =>
      qs.map(planFile).reduce(_.unionByName(_)).dropDuplicates("fid")

    case JoinQ(qs) =>
      val planned = qs.map(planFile)
      planned.tail.foldLeft(planned.head)((acc, r) =>
        acc.join(r.select("fid"), Seq("fid"), "left_semi"))

    case MinusQ(l, r) =>
      planFile(l).join(planFile(r).select("fid"), Seq("fid"), "left_anti")

    case ParentsOf(q) =>
      val childIds = planFile(q).select(col("fid").as("child_fid"))
      val parentIds = catalog.parentChild
        .join(childIds, Seq("child_fid"), "left_semi")
        .select(col("parent_fid").as("fid"))
      fileRows(parentIds)

    case ChildrenOf(q) =>
      val parentIds = planFile(q).select(col("fid").as("parent_fid"))
      val childIds = catalog.parentChild
        .join(parentIds, Seq("parent_fid"), "left_semi")
        .select(col("child_fid").as("fid"))
      fileRows(childIds)

    case WhereQ(child, e) =>
      val df = planFile(child)
      df.filter(filePred(df, e))

    case SkipLimitQ(child, skip, limit) =>
      page(planFile(child), skip, limit, ordered = false)

    case OrderedQ(child) =>
      planFile(child).orderBy("fid")

    case FilterQ(name, params, kw, qs) =>
      Filters.apply(spark, name, params, kw, qs.map(planFile))

    case EmptyQ => catalog.files.limit(0)

    case other =>
      throw new IllegalStateException(s"unresolved node reached planner: $other")
  }

  /** re-attach full file rows to an fid set via semi join */
  private def fileRows(fids: DataFrame): DataFrame =
    catalog.files.join(fids, Seq("fid"), "left_semi")

  private def page(df: DataFrame, skip: Long, limit: Option[Long], ordered: Boolean): DataFrame = {
    var out = if (ordered) df.orderBy("fid") else df
    if (skip > 0) out = out.offset(skip.toInt)
    limit.foreach(l => out = out.limit(l.toInt))
    out
  }

  def filePred(df: DataFrame, e: MetaExp): Column =
    MetaCompiler.compile(e, df("metadata"), fileAttrs(df),
      shredded = n => catalog.shredding.get(n).map { case (c, t) => (df(c), t) })

  // ---------- dataset selectors & queries ----------

  /** resolve selectors to a distinct (dataset_namespace, dataset_name) set —
    * dimension-sized, broadcastable (`DBDataset.sql_for_bdqs`,
    * `dbobjects2.py:1451-1550`). */
  def datasetNames(sels: List[DatasetSel]): DataFrame =
    selectedDatasets(sels)
      .select(col("namespace").as("dataset_namespace"), col("name").as("dataset_name"))
      .distinct()

  /** full dataset rows matching the selector list, subsets expanded,
    * having applied (per-selector). */
  def selectedDatasets(sels: List[DatasetSel]): DataFrame =
    sels.map(selectedDatasets1).reduce(_.unionByName(_)).dropDuplicates("namespace", "name")

  private def selectedDatasets1(sel: DatasetSel): DataFrame = {
    val ds = catalog.datasets
    val base = ds.filter(specPred(sel.spec))
    val expanded =
      if (!sel.withSubsets) base
      else {
        val edges = catalog.datasetsParentChild
        // iterative closure with a visited accumulator — cycle-safe like the
        // path-array guard in dbobjects2.py:1061-1088. Dataset DAGs are
        // dimension-sized; the loop runs on broadcastable frames.
        var acc = base.select("namespace", "name")
        var frontier = acc
        var level = 0
        val maxLevels = if (sel.recursively) 100 else 1
        while (level < maxLevels && !frontier.isEmpty) {
          val next = edges.join(frontier,
            edges("parent_namespace") === frontier("namespace") &&
              edges("parent_name") === frontier("name"), "left_semi")
            .select(col("child_namespace").as("namespace"), col("child_name").as("name"))
            .distinct()
          frontier = next.join(acc, Seq("namespace", "name"), "left_anti")
          if (sel.recursively) frontier = frontier.localCheckpoint(eager = true)
          acc = acc.unionByName(frontier).distinct()
          level += 1
        }
        ds.join(acc, Seq("namespace", "name"), "left_semi")
      }
    sel.having match {
      case Some(h) =>
        expanded.filter(MetaCompiler.compile(h, expanded("metadata"), datasetAttrs(expanded)))
      case None => expanded
    }
  }

  private def specPred(spec: DsSpec): Column = spec match {
    case DsExact(ns, n) => col("namespace") === ns.get && col("name") === n
    case DsPattern(ns, p) => col("namespace") === ns.get && col("name").like(p)
    // unanchored search semantics, like Postgres `~` (dbobjects2.py:1463-1472)
    case DsRegexp(ns, re) =>
      col("namespace") === ns.get && col("name").rlike(RegexDialect.toJava(re))
  }

  def planDatasetQuery(sels: List[DatasetSel]): DataFrame = selectedDatasets(sels)

  // ---------- named-query search ----------

  def planQueryQuery(pattern: Option[Either[DsPattern, DsRegexp]],
      where: Option[MetaExp]): DataFrame = {
    var df = catalog.queries
    pattern.foreach {
      case Left(DsPattern(ns, p)) =>
        ns.foreach(n => df = df.filter(col("namespace") === n))
        df = df.filter(col("name").like(p))
      case Right(DsRegexp(ns, re)) =>
        ns.foreach(n => df = df.filter(col("namespace") === n))
        df = df.filter(col("name").rlike(RegexDialect.toJava(re)))
    }
    where.foreach(w =>
      df = df.filter(MetaCompiler.compile(w, df("metadata"), queryAttrs(df))))
    df
  }
}

object Planner {

  import MetaCompiler.{ShredBool, ShredNum, ShredStr}

  /** file object-attribute bindings; `created_timestamp` as epoch seconds
    * (MQL datetime constants are epoch floats) */
  def fileAttrs(df: DataFrame): MetaCompiler.Attrs = {
    case "creator" => Some((df("creator"), ShredStr))
    case "created_timestamp" =>
      Some((unix_timestamp(df("created_timestamp")).cast("double"), ShredNum))
    case "updated_timestamp" =>
      Some((unix_timestamp(df("updated_timestamp")).cast("double"), ShredNum))
    case "updated_by" => Some((df("updated_by"), ShredStr))
    case "name" => Some((df("name"), ShredStr))
    case "namespace" => Some((df("namespace"), ShredStr))
    case "size" => Some((df("size"), ShredNum))
    case "retired" => Some((df("retired"), ShredBool))
    case _ => None
  }

  def datasetAttrs(df: DataFrame): MetaCompiler.Attrs = {
    case "creator" => Some((df("creator"), ShredStr))
    case "created_timestamp" =>
      Some((unix_timestamp(df("created_timestamp")).cast("double"), ShredNum))
    case "name" => Some((df("name"), ShredStr))
    case "namespace" => Some((df("namespace"), ShredStr))
    case "description" => Some((df("description"), ShredStr))
    case "frozen" => Some((df("frozen"), ShredBool))
    case "monotonic" => Some((df("monotonic"), ShredBool))
    case _ => None
  }

  def queryAttrs(df: DataFrame): MetaCompiler.Attrs = {
    case "creator" => Some((df("creator"), ShredStr))
    case "created_timestamp" =>
      Some((unix_timestamp(df("created_timestamp")).cast("double"), ShredNum))
    case "name" => Some((df("name"), ShredStr))
    case "namespace" => Some((df("namespace"), ShredStr))
    case "source" => Some((df("source"), ShredStr))
    case _ => None
  }
}
