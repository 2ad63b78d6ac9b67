package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe for Spark 4.1 Variant semantics (deleted before final). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(
      """{"core.runs": [12345, 7], "data.e": 1.5, "data.s": "1.5", "data.type": "MC", "data.bits": {"muon":1,"electron":0}, "f": true}""",
      """{"core.runs": "notarray", "data.e": 2}"""
    ).toDF("m").select(parse_json($"m").as("v"))
    df.createOrReplaceTempView("t")
    def show(sql: String): Unit = {
      print(sql + "  ==>  ")
      try spark.sql(sql).collect().foreach(r => print(r))
      catch { case e: Throwable => print("ERROR: " + e.getMessage.take(200)) }
      println()
    }
    show("""select variant_get(v, '$["core.runs"]') from t""")
    show("""select variant_get(v, "$['core.runs']") from t""")
    show("""select try_variant_get(v, '$.`core.runs`') from t""")
    show("""select try_variant_get(v, "$['data.e']", 'double') from t""")
    show("""select try_variant_get(v, "$['data.s']", 'double') from t""")      // string->double cast? want null for strictness
    show("""select schema_of_variant(try_variant_get(v, "$['data.e']")) from t""")
    show("""select schema_of_variant(try_variant_get(v, "$['core.runs']")) from t""")
    show("""select schema_of_variant(try_variant_get(v, "$['nope']")) from t""")
    show("""select try_variant_get(v, "$['core.runs'][0]", 'bigint') from t""")
    show("""select try_variant_get(v, "$['core.runs']", 'array<variant>') from t""")
    show("""select exists(try_variant_get(v, "$['core.runs']", 'array<variant>'), x -> try_variant_get(x, '$', 'double') = 7.0) from t""")
    show("""select try_variant_get(v, "$['data.bits']", 'map<string,variant>') from t""")
    show("""select try_variant_get(v, "$['data.bits']['muon']", 'bigint') from t""")
    show("""select try_variant_get(v, "$['f']", 'boolean') from t""")
    show("""select try_variant_get(v, "$['data.e']", 'string') from t""")      // number->string cast? want null for strictness
    show("""select cast(try_variant_get(v, "$['data.type']") as string) from t""")
    spark.stop()
  }
}
