package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-bigram histogram: `string → map<bigram, count>` in one
  * compiled pass (reference capability: the CCNet/KenLM-style perplexity
  * quality filter trains on character n-gram counts).
  *
  * The composable formulation explodes one ROW PER BIGRAM OCCURRENCE —
  * corpus-characters-sized — and shuffles it on (doc_id, bigram) just to
  * rebuild the per-document counts this expression produces directly.
  * Emitting the aggregated map instead shrinks the exploded frame to
  * per-document DISTINCT bigrams (bounded by charset², typically 10-100×
  * smaller) and removes that shuffle entirely.
  *
  * Semantics pinned for oracle parity: bigrams are CODE-POINT pairs (the
  * `substr(s, i, 2)` definition both Spark and DuckDB use), positions
  * 1..len-1, so a string of n code points yields n-1 occurrences; counts
  * are exact longs. Case folding stays OUTSIDE (callers pass `lower(text)`
  * through the codegen'd built-in). Strings shorter than 2 code points
  * yield an empty map.
  */
case class CharBigramsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_char_bigrams requires a string argument, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    CharBigramsExpr.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharBigramsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBigramsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_char_bigrams"
}

object CharBigramsExpr {

  def compute(s: UTF8String): MapData = {
    val str = s.toString
    val counts = new java.util.LinkedHashMap[String, java.lang.Long]()
    val n = str.length // UTF-16 units; stepping below is by code point
    var p0 = 0
    var p1 = if (n > 0) str.offsetByCodePoints(0, 1) else 0
    while (p1 < n) {
      val p2 = str.offsetByCodePoints(p1, 1)
      counts.merge(str.substring(p0, p2), 1L,
        (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
      p0 = p1
      p1 = p2
    }
    val ks = new Array[Any](counts.size)
    val vs = new Array[Any](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      ks(i) = UTF8String.fromString(e.getKey)
      vs(i) = e.getValue.longValue()
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  def bigramCounts(text: Column): Column =
    GraftShim.column(CharBigramsExpr(GraftShim.expression(text)))

  /** register `graft_char_bigrams` for SQL use */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_bigrams", exprs => {
        require(exprs.length == 1,
          s"graft_char_bigrams takes 1 argument, got ${exprs.length}")
        CharBigramsExpr(exprs.head)
      }, "built-in")
}
