package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.mql.{Ast, Filters}

/** Example USER-side filter class for the conf-loaded registry
  * (`spark.graft.filters`, the Spark analog of the reference's
  * server-config filter loading, filters.py:201-218). This lives in the
  * QUERIES package, not the engine: it is exactly the code a deployment
  * would ship on its own classpath and name in conf — the `mql_filter_user`
  * gate proves the whole path (conf entry → Class.forName → zero-arg
  * construct → per-call resolution) against a DuckDB oracle.
  *
  * `band(lo, hi, key="col")` keeps files whose numeric column `key`
  * (default `size`) falls in [lo, hi) — a plain pushdown-friendly range
  * predicate, so the filter composes with partition pruning at scale.
  */
final class BandFilter extends Filters.GraftFilter {
  override def apply(spark: SparkSession, inputs: Seq[DataFrame],
      params: Seq[Ast.Const], kw: Map[String, Ast.Const]): DataFrame = {
    require(params.size == 2, "usage: band(lo, hi[, key=\"column\"])")
    def num(c: Ast.Const): Long = c match {
      case Ast.IntC(v)   => v
      case Ast.FloatC(v) => v.toLong
      case other => throw new IllegalArgumentException(
        s"band: numeric bound expected, got $other")
    }
    val key = kw.get("key").map(_.value.toString).getOrElse("size")
    inputs.head.filter(col(key) >= num(params(0)) && col(key) < num(params(1)))
  }
}
