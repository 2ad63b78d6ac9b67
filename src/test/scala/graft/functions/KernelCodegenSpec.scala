package graft.functions

import graft.mql.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

/** The native kernels exist to stay INSIDE whole-stage codegen (the
  * brief's "widen the WholeStageCodegen spans"); a kernel that silently
  * fell back to interpreted eval would still be correct, so correctness
  * gates can't catch that regression — this spec pins the plan shape.
  */
class KernelCodegenSpec extends SparkTestBase {

  private def codegenSpans(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.toString
    }

  /** the kernel must appear inside SOME WholeStageCodegen span */
  private def assertFused(df: DataFrame, marker: String): Unit = {
    val spans = codegenSpans(df)
    assert(spans.exists(_.contains(marker)),
      s"$marker not inside any WholeStageCodegen span:\n" +
        df.queryExecution.executedPlan.toString.take(2000))
  }

  test("all five native kernels fuse into whole-stage codegen") {
    // file-backed relations — local Seq frames collapse to LocalTableScan
    // and never enter codegen, which would vacuously pass/fail
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    assertFused(docs.select(SimHash60Expr.simhash60(split(lower(col("text")), " "))),
      "graft_simhash60")
    assertFused(docs.select(explode(CharBigramsExpr.bigramCounts(lower(col("text"))))),
      "graft_char_bigrams")
    assertFused(
      docs.select(MinHashExpr.minhash(split(lower(col("text")), " "), 8)),
      "graft_minhash")
    assertFused(docs.select(Adler32Expr.adler32(col("text"))), "graft_adler32")
    assertFused(emb.select(DotProductExpr.dotProduct(col("embedding"), col("embedding"))),
      "graft_dot")
  }
}
