package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for adler32 over a string's UTF-8 bytes.
  *
  * This is the reference's `hash(m, r)` partition-selection function
  * (`metacat/filters/filters.py:105-123`) on the engine's hot path: a
  * deterministic, order-independent sharding predicate pushed into the
  * scan. A codegen'd expression keeps the filter inside whole-stage
  * codegen (a Scala UDF would break the codegen span and pay
  * serialization per row).
  */
case class Adler32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adler32 requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Adler32Expr.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Adler32Expr.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Adler32Expr =
    copy(child = newChild)

  override def prettyName: String = "graft_adler32"
}

object Adler32Expr {

  /** same algorithm as java.util.zip.Adler32 / zlib */
  def compute(bytes: Array[Byte]): Long = {
    val a = new java.util.zip.Adler32()
    a.update(bytes)
    a.getValue
  }

  def adler32(c: Column): Column =
    GraftShim.column(Adler32Expr(GraftShim.expression(c)))

  /** register `graft_adler32` for SQL use */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adler32", exprs => {
        require(exprs.length == 1, s"graft_adler32 takes 1 argument, got ${exprs.length}")
        Adler32Expr(exprs.head)
      }, "built-in")
}
