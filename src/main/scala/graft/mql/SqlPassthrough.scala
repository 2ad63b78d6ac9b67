package graft.mql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}
import graft.metacat.MetacatCatalog

/** MQL-in-`spark.sql` passthrough (SURVEY §7.3): a [[ParserInterface]]
  * that recognizes MQL statement leaders (`files …`, `datasets …`,
  * `union(…)`, `{…}` …) and plans them through the MQL engine, delegating
  * everything else — all of SQL — to Spark's own parser. Lets a plain SQL
  * notebook (or any SQL-speaking client of the session) run reference
  * queries verbatim:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions") …
  * MqlSql.install(spark, catalog)
  * spark.sql("files from prod:raw where core.run > 500").show()
  * spark.sql("SELECT count(*) FROM range(10)").show()   // untouched
  * }}}
  *
  * Dispatch is by leading token: no SQL statement begins with an MQL
  * leader, so SQL text can never be captured; malformed MQL surfaces the
  * MQL parser's error (not a baffling SQL one). The planned MQL query is
  * injected as an already-ANALYZED logical plan.
  */
object MqlSql {

  // keyed WEAKLY by session so a dropped session doesn't pin its catalog
  private val catalogs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, MetacatCatalog]())

  /** bind the catalog MQL text in `spark.sql` resolves against */
  def install(spark: SparkSession, cat: MetacatCatalog): Unit = {
    catalogs.put(spark, cat); ()
  }

  private[mql] def catalogFor(spark: SparkSession): MetacatCatalog = {
    val cat = catalogs.get(spark)
    if (cat == null) throw new IllegalStateException(
      "MQL-over-SQL needs a catalog: call graft.mql.MqlSql.install(spark, catalog) first")
    cat
  }

  /** true iff [[install]] has bound a catalog for this session — the
    * gate for MQL capture: a session that never installed one gets pure
    * SQL behavior (a typo'd `filter …` surfaces Spark's own parse error,
    * not an IllegalStateException about a feature it never enabled) */
  private[mql] def installed(spark: SparkSession): Boolean =
    catalogs.get(spark) != null

  /** MQL statement leaders (the reference grammar's top productions);
    * `{` opens the intersect form. Case-insensitive: no SQL statement
    * begins with any of these words, and `Files from …` routed to the
    * SQL parser would die with a baffling SQL error instead of the MQL
    * parser's pointed one. */
  private val Leader =
    "(?i)^\\s*(files|fids|datasets|queries|union\\s*\\(|filter\\s|parents\\s*\\(|children\\s*\\(|\\{)".r

  private[mql] def looksLikeMql(text: String): Boolean =
    Leader.findFirstIn(text).isDefined
}

/** the injected parser: MQL leaders → MQL engine, everything else →
  * `delegate` (Spark's parser) */
class MqlSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def planMql(text: String): LogicalPlan = {
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("no active SparkSession for MQL text"))
    Mql.query(spark, MqlSql.catalogFor(spark), text).queryExecution.analyzed
  }

  /** MQL capture requires BOTH an MQL leader and an installed catalog —
    * GraftExtensions injects this parser into every session that loads
    * it, so a session that never called `MqlSql.install` must behave as
    * pure SQL (delegate everything, even leader-shaped statements) */
  private def captures(sqlText: String): Boolean =
    MqlSql.looksLikeMql(sqlText) &&
      SparkSession.getActiveSession.exists(MqlSql.installed)

  /** delegate, but when the SQL parser rejects a LEADER-shaped statement
    * in an uninstalled session, name the likely cause — the user probably
    * meant MQL and forgot `MqlSql.install` */
  private def delegated[T](sqlText: String)(f: => T): T =
    try f catch {
      case e: Exception if MqlSql.looksLikeMql(sqlText) =>
        throw new IllegalStateException(
          "statement looks like MQL but no catalog is bound to this session " +
          "— call graft.mql.MqlSql.install(spark, catalog) first " +
          s"(the SQL parser rejected it: ${e.getMessage})", e)
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    if (captures(sqlText)) planMql(sqlText)
    else delegated(sqlText)(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    if (captures(sqlText)) planMql(sqlText)
    else delegated(sqlText)(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseQuery(sqlText: String): LogicalPlan =
    if (captures(sqlText)) planMql(sqlText)
    else delegated(sqlText)(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
