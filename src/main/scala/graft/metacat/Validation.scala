package graft.metacat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time metadata validation — the declarative constraint system of
  * parameter categories / dataset requirements
  * (`metacat/util/validation.py:3-147`; category table `schema.sql:162-176`),
  * re-expressed as a distributed check: one pass over the candidate rows
  * produces a violations DataFrame (empty ⇒ valid). Enforced at WRITE time
  * only, never at query time — same posture as the reference.
  */
object Validation {

  /** one parameter's declared constraints (types from validation.py:20) */
  final case class Constraint(
      key: String,
      typ: Option[String] = None, // int float text boolean dict list int[] float[] text[] boolean[] any
      min: Option[Double] = None,
      max: Option[Double] = None,
      values: Seq[String] = Nil, // enumeration, matched on canonical string form
      pattern: Option[String] = None, // anchored regexp for text
      required: Boolean = false)

  private def typeOk(v: Column, typ: String): Column = {
    def schemaIs(re: String) = schema_of_variant(v).rlike(re)
    typ match {
      case "any" => lit(true)
      case "int" => schemaIs("^(BIGINT|INT|SMALLINT|TINYINT)$")
      case "float" => schemaIs("^(DOUBLE|FLOAT|DECIMAL)")
      case "text" => schemaIs("^STRING$")
      case "boolean" => schemaIs("^BOOLEAN$")
      case "dict" => schemaIs("^OBJECT|^STRUCT")
      case "list" => schemaIs("^ARRAY")
      case "int[]" | "float[]" | "text[]" | "boolean[]" =>
        val elemRe = typ match {
          case "int[]" => "^(BIGINT|INT|SMALLINT|TINYINT)$"
          case "float[]" => "^(DOUBLE|FLOAT|DECIMAL|BIGINT|INT)" // numeric widening
          case "text[]" => "^STRING$"
          case _ => "^BOOLEAN$"
        }
        val arr = try_variant_get(v, "$", "array<variant>")
        arr.isNotNull && coalesce(
          forall(arr, x => schema_of_variant(x).rlike(elemRe)), lit(true))
      case other => throw new IllegalArgumentException(s"unknown declared type $other")
    }
  }

  /** violations for one row's metadata variant against one constraint;
    * null when the row passes */
  private def violation(meta: Column, c: Constraint): Column = {
    val v = try_variant_get(meta, s"$$['${c.key}']", "variant")
    val present = v.isNotNull
    val numV = try_variant_get(v, "$", "double")
    val strV = when(schema_of_variant(v) === "STRING", try_variant_get(v, "$", "string"))
    val checks: Seq[(Column, String)] = Seq(
      (lit(c.required) && !present, s"${c.key}: required parameter missing")) ++
      c.typ.map(t => (present && !typeOk(v, t),
        s"${c.key}: value does not conform to declared type $t")).toSeq ++
      c.min.map(m => (present && coalesce(numV < m, strV < m.toString, lit(false)),
        s"${c.key}: value below min $m")).toSeq ++
      c.max.map(m => (present && coalesce(numV > m, strV > m.toString, lit(false)),
        s"${c.key}: value above max $m")).toSeq ++
      (if (c.values.nonEmpty) {
        // numeric enum entries must compare NUMERICALLY: the stored "1"
        // and a BIGINT variant 1 (canonical string "1.0") are the same
        // value. String entries compare on the string form.
        val numVals = c.values.flatMap(v => scala.util.Try(v.toDouble).toOption)
        val strLeg = coalesce(strV.isin(c.values: _*), lit(false))
        val numLeg =
          if (numVals.nonEmpty) coalesce(numV.isin(numVals: _*), lit(false))
          else lit(false)
        Seq((present && !(strLeg || numLeg), s"${c.key}: value not in enumeration"))
      } else Nil) ++
      c.pattern.map(p => (present && !coalesce(strV.rlike("^(?:" + p + ")$"), lit(false)),
        s"${c.key}: value does not match pattern $p")).toSeq
    checks.foldLeft(lit(null).cast("string")) { case (acc, (bad, msg)) =>
      coalesce(acc, when(bad, lit(msg)))
    }
  }

  /** Parse a dataset's stored `file_metadata_requirements` JSON —
    * `{key: {required, type, values, min, max, pattern}}`, the shape of
    * `DBDataset.FileMetaRequirements` (dbobjects2.py:1577-1597) — into
    * [[Constraint]]s. Uses Jackson (already on Spark's classpath). */
  def parseRequirements(json: String): Seq[Constraint] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val node = new ObjectMapper().readTree(json)
    require(node != null && node.isObject, s"requirements must be a JSON object: $json")
    node.properties().asScala.toSeq.map { e =>
      val key = e.getKey
      val c = e.getValue
      def numOpt(f: String) = Option(c.get(f)).filter(_.isNumber).map(_.asDouble())
      def strOpt(f: String) = Option(c.get(f)).filter(_.isTextual).map(_.asText())
      val values = Option(c.get("values")).filter(_.isArray)
        .map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Nil)
      Constraint(
        key = key,
        typ = strOpt("type"),
        min = numOpt("min"),
        max = numOpt("max"),
        values = values,
        pattern = strOpt("pattern"),
        required = Option(c.get("required")).exists(_.asBoolean(false)))
    }
  }

  /** validate rows carrying a `metadata_json` (or Variant `metadata`)
    * column; returns (fid, error) rows — empty means all valid */
  def validate(rows: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    if (constraints.isEmpty)
      return rows.sparkSession.emptyDataFrame
        .withColumn("fid", lit("")).withColumn("error", lit("")).limit(0)
    val meta =
      if (rows.columns.contains("metadata")) col("metadata")
      else parse_json(col("metadata_json"))
    val errs = array(constraints.map(c => violation(meta, c)): _*)
    rows.select(col("fid"), explode(filter(errs, _.isNotNull)).as("error"))
  }
}
