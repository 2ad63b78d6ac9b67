package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point: registers the engine's native
  * codegen'd expressions in the SQL function registry, so plain
  * `spark.sql` (and any SQL-speaking client of the session) can call
  * them without touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * ...
  * spark.sql("SELECT graft_adler32(fid) % 10 FROM files")
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * `graft_adler32` is the reference's partition-assignment hash
  * (filters.py:105-123); `graft_dot` is the float-array dot-product
  * kernel every similarity operator runs on. Both stay inside
  * whole-stage codegen when invoked from SQL, exactly as from Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // MQL statements pass straight through spark.sql (SURVEY §7.3):
    // `spark.sql("files from prod:raw where core.run > 500")` after
    // MqlSql.install(spark, catalog); plain SQL is delegated untouched
    ext.injectParser((_, delegate) => new graft.mql.MqlSqlParser(delegate))
    ext.injectFunction((
      new FunctionIdentifier("graft_adler32"),
      new ExpressionInfo(classOf[Adler32Expr].getName, "graft_adler32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_adler32 takes one string argument")
        Adler32Expr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes two float-array arguments")
        DotProductExpr(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60Expr].getName, "graft_simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash60 takes one string-array argument")
        SimHash60Expr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_bigrams"),
      new ExpressionInfo(classOf[CharBigramsExpr].getName, "graft_char_bigrams"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_char_bigrams takes one string argument")
        CharBigramsExpr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashExpr].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash takes (array<string>, int literal)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash: numHashes must be an integer literal, got $other")
        }
        MinHashExpr(args.head, k)
      }))
  }
}
