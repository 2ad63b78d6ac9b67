package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the dot product of two float/double
  * arrays — the hot inner loop of every similarity operator (brute-force
  * top-k, LSH exact-verify, hyperplane projections; reference capability:
  * embedding near-dup search).
  *
  * Spark's composable form `aggregate(zip_with(a, b, (x,y) -> x*y), ...)`
  * is correct but interpreted per element (higher-order functions don't
  * participate in codegen) and allocates a zipped array per row; at
  * millions of candidate pairs × 64 dims that dominates the operator. This
  * expression is a codegen'd tight loop: no allocation, stays inside the
  * whole-stage span.
  *
  * Semantics pinned for oracle parity: elements are widened to double and
  * accumulated in ascending index order — bit-identical to the
  * left-to-right `aggregate` fold and to the DuckDB `list_sum(
  * list_transform(...))` the test oracle uses. Length mismatch truncates
  * to the shorter array (embeddings are fixed-width; defensive only).
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<float|double> args, got ${left.dataType}, ${right.dataType}")

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductExpr.compute($a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)})")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProductExpr {

  /** ascending-order double-widened dot product; null elements contribute
    * 0 (embeddings carry none — defensive) */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y
      }
      i += 1
    }
    s
  }

  def dotProduct(a: Column, b: Column): Column =
    GraftShim.column(DotProductExpr(GraftShim.expression(a), GraftShim.expression(b)))

  /** register `graft_dot` for SQL use */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => {
        require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
        DotProductExpr(exprs.head, exprs(1))
      }, "built-in")
}
