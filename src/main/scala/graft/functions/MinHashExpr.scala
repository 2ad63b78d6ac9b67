package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: `array<shingle> → array<numHashes minima>`
  * in one compiled pass (reference capability: linear-cost near-duplicate
  * detection via MinHash-LSH banding).
  *
  * The composable form — `transform(sequence(0, k-1), h ->
  * array_min(transform(shingles, x -> conv(substr(md5(concat(h,':',x)),
  * 1,15),16,10))))` — is correct but interpreted: k nested folds per
  * document, each allocating a transformed copy of the shingle array, all
  * outside codegen. This kernel runs the k×|shingles| md5 loop in
  * compiled code with zero per-hash allocation and stays inside the
  * whole-stage span. It is the third native kernel beside
  * [[SimHash60Expr]] and [[CharBigramsExpr]].
  *
  * Semantics pinned for oracle parity (the DuckDB oracle replays the
  * same construction): element h of the result is
  * `min over shingles s of hash60(utf8("h" + ":" + s))` where `hash60`
  * is the first 15 md5 hex digits read base-16 (shared with
  * [[SimHash60Expr]]); null shingles are skipped (the `array_min`
  * contract), and an empty/all-null shingle set yields null elements —
  * exactly what the HOF formulation produces.
  */
case class MinHashExpr(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 1024,
    s"graft_minhash: numHashes out of range: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    MinHashExpr.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashExpr {

  /** `"h:"` prefixes are shared across all rows of a task — tiny static
    * cache up to the common k, computed on the fly past it */
  private val cachedPrefixes: Array[Array[Byte]] =
    (0 until 64).map(h => (h.toString + ":").getBytes("UTF-8")).toArray
  private def prefixOf(h: Int): Array[Byte] =
    if (h < cachedPrefixes.length) cachedPrefixes(h)
    else (h.toString + ":").getBytes("UTF-8")

  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val sBytes = shingles.getUTF8String(i).getBytes
        var h = 0
        while (h < numHashes) {
          val v = SimHash60Expr.hash60(prefixOf(h), sBytes)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) {
      out(h) = if (any) mins(h) else null
      h += 1
    }
    new GenericArrayData(out)
  }

  def minhash(shingles: Column, numHashes: Int): Column =
    GraftShim.column(MinHashExpr(GraftShim.expression(shingles), numHashes))

  /** register `graft_minhash(arr, k)` for SQL use (k must be a literal) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => {
        require(exprs.length == 2, s"graft_minhash takes 2 arguments, got ${exprs.length}")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash: numHashes must be an integer literal, got $other")
        }
        MinHashExpr(exprs.head, k)
      }, "built-in")
}
