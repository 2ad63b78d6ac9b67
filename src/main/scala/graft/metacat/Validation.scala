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

  /** One parameter's declared constraints (types from validation.py:20).
    * Enumerations keep their JSON types: string entries match only string
    * values, numeric entries only numeric values (Python's `value in
    * values` — `"1" != 1` — and the engine's own numbers-never-coerce
    * rule, mql.rst:165-172). */
  final case class Constraint(
      key: String,
      typ: Option[String] = None, // int float text boolean dict list int[] float[] text[] boolean[] any
      min: Option[Double] = None,
      max: Option[Double] = None,
      values: Seq[String] = Nil, // string-typed enumeration entries
      numValues: Seq[Double] = Nil, // numeric enumeration entries
      boolValues: Seq[Boolean] = Nil, // boolean enumeration entries
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
    // strict extractions — a STRING variant "1" must NOT satisfy numeric
    // constraints via the cast (try_variant_get coerces; the schema guard
    // is what enforces numbers-never-coerce)
    val numV = graft.mql.MetaCompiler.numericVariant(v)
    val strV = graft.mql.MetaCompiler.stringVariant(v)
    val checks: Seq[(Column, String)] = Seq(
      (lit(c.required) && !present, s"${c.key}: required parameter missing")) ++
      c.typ.map(t => (present && !typeOk(v, t),
        s"${c.key}: value does not conform to declared type $t")).toSeq ++
      c.min.map(m => (present && coalesce(numV < m, strV < m.toString, lit(false)),
        s"${c.key}: value below min $m")).toSeq ++
      c.max.map(m => (present && coalesce(numV > m, strV > m.toString, lit(false)),
        s"${c.key}: value above max $m")).toSeq ++
      (if (c.values.nonEmpty || c.numValues.nonEmpty || c.boolValues.nonEmpty) {
        // each leg is type-strict: a string value can only match a string
        // entry, a number only a numeric entry, a boolean only a boolean
        // entry — mirroring Python's typed `value in values`. Array
        // values check element-wise, like the reference's
        // `all(x in values for x in value)` (validation.py:113-116)
        def leg(vals: Seq[Any], extracted: Column) =
          if (vals.isEmpty) lit(false)
          else coalesce(extracted.isin(vals: _*), lit(false))
        def oneOk(x: Column): Column = {
          val boolX = when(schema_of_variant(x) === "BOOLEAN",
            try_variant_get(x, "$", "boolean"))
          leg(c.values, graft.mql.MetaCompiler.stringVariant(x)) ||
            leg(c.numValues, graft.mql.MetaCompiler.numericVariant(x)) ||
            leg(c.boolValues, boolX)
        }
        val arr = try_variant_get(v, "$", "array<variant>")
        val arrOk = arr.isNotNull && coalesce(forall(arr, oneOk), lit(true))
        Seq((present && !(oneOk(v) || arrOk),
          s"${c.key}: value not in enumeration"))
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
      val entries = Option(c.get("values")).filter(_.isArray)
        .map(_.elements().asScala.toSeq).getOrElse(Nil)
      Constraint(
        key = key,
        typ = strOpt("type"),
        min = numOpt("min"),
        max = numOpt("max"),
        values = entries.filter(_.isTextual).map(_.asText()),
        numValues = entries.filter(_.isNumber).map(_.asDouble()),
        boolValues = entries.filter(_.isBoolean).map(_.asBoolean()),
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
