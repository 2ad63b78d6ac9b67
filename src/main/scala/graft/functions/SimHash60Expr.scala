package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing the 60-bit TF-weighted SimHash of
  * a token array in ONE compiled pass (reference capability: near-dup
  * fingerprinting for crawl-scale corpora, per the Manku-Jain-Sarma
  * design).
  *
  * The composable form —
  * `aggregate(transform(sequence(0,59), j -> aggregate(transform(hs, ...)`
  * — is correct but interpreted: 60 separate folds over the token array,
  * each allocating a transformed copy, none of it inside codegen. At
  * bench sf0.1 that single expression dominated the whole suite. Here the
  * token is md5-hashed and scattered into the 60 bit-counters in a tight
  * JVM loop (`h &= h-1` over set bits), so cost is O(tokens × popcount)
  * with zero per-bit array allocation, and the call site stays inside the
  * whole-stage span.
  *
  * Semantics pinned for oracle parity with the DuckDB reference
  * (`list_sum` over `CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END`):
  *  - token hash = first 15 hex digits of md5(utf8) read base-16 — the
  *    same 60-bit value as `conv(substr(md5(w), 1, 15), 16, 10)`;
  *  - bit j of the result is set iff strictly more tokens have bit j set
  *    than clear (counter > 0; ties clear);
  *  - a null token contributes −1 to every counter (the CASE's ELSE arm
  *    catches the null comparison) — defensive, `split()` emits none;
  *  - an empty array hashes to 0.
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 requires array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    SimHash60Expr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash60Expr.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash60"
}

object SimHash60Expr {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** first 15 hex digits of md5(bytes) as a long: the first 8 digest bytes
    * big-endian, dropped low nibble — bit-identical to
    * `conv(substr(md5(w), 1, 15), 16, 10)` */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    digestTo60(d.digest(bytes))
  }

  /** hash60 over the concatenation prefix ++ body, with no intermediate
    * buffer (incremental digest) — the MinHash inner loop */
  def hash60(prefix: Array[Byte], body: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    d.update(prefix)
    d.update(body)
    digestTo60(d.digest())
  }

  private def digestTo60(h: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        // ones-count per bit; the -1 contributions fall out of n below
        var h = hash60(tokens.getUTF8String(i).getBytes)
        while (h != 0L) {
          counts(java.lang.Long.numberOfTrailingZeros(h)) += 1
          h &= h - 1
        }
      }
      i += 1
    }
    // counter_j = ones_j - (n - ones_j) = 2*ones_j - n  (nulls always -1)
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (2L * counts(j) - n > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  def simhash60(tokens: Column): Column =
    GraftShim.column(SimHash60Expr(GraftShim.expression(tokens)))

  /** register `graft_simhash60` for SQL use */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash60", exprs => {
        require(exprs.length == 1, s"graft_simhash60 takes 1 argument, got ${exprs.length}")
        SimHash60Expr(exprs.head)
      }, "built-in")
}
