package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `keep-when` (reference src/step-functions/keep-when.ts:44-55):
  * keep events whose payload validates against a user JSON Schema.
  *
  * The common schema subset (type / properties / required / numeric
  * ranges / enum / const / anyOf / allOf / not) compiles to a native
  * Column predicate over the JSON-string payload — codegen'd,
  * pushdown-eligible, no per-row validator object. Type tests use
  * Spark 4 VARIANT (`parse_json` + `schema_of_variant`) so JSON
  * number-vs-string is decided exactly, matching ajv.
  *
  * Schemas are given as jackson `JsonNode` (parsed from the YAML/JSON
  * pipeline spec). Unsupported keywords throw at compile time —
  * callers see it at plan build, not mid-job.
  */
object JsonSchemaFilter {
  import com.fasterxml.jackson.databind.JsonNode

  /** Compile `schema` to a predicate over `payload` (a JSON string
    * column). The payload is parsed to VARIANT exactly once — the
    * predicate is evaluated inside an `exists` over a one-element
    * array so every sub-constraint shares the parsed value (Catalyst
    * does not CSE across variant expressions; without this, each leaf
    * re-parsed the JSON).
    */
  def compile(schema: JsonNode, payload: Column): Column =
    exists(array(try_parse_json(payload)), v => compileOverVariant(schema, v, "$"))

  /** Predicate over an already-parsed VARIANT root. */
  def compileOverVariant(schema: JsonNode, root: Column, path: String): Column =
    compileInner(schema, root, path)

  private def compileInner(schema: JsonNode, root: Column, path: String): Column = {
    require(schema.isObject, s"unsupported schema node: $schema")
    val fields = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.fieldNames()).asScala.toSet
    val v = variantAt(root, path)

    val conds = Seq.newBuilder[Column]
    // an absent subtree fails everything except being unconstrained
    if (fields.contains("type")) {
      val t = schema.get("type").asText
      conds += typeTest(v, t)
    }
    if (fields.contains("minimum"))
      conds += numeric(v) >= lit(schema.get("minimum").asDouble)
    if (fields.contains("maximum"))
      conds += numeric(v) <= lit(schema.get("maximum").asDouble)
    if (fields.contains("exclusiveMinimum"))
      conds += numeric(v) > lit(schema.get("exclusiveMinimum").asDouble)
    if (fields.contains("exclusiveMaximum"))
      conds += numeric(v) < lit(schema.get("exclusiveMaximum").asDouble)
    if (fields.contains("const")) {
      val c = schema.get("const")
      conds += (if (c.isNumber) numeric(v) === lit(c.asDouble)
                else stringy(v) === lit(c.asText))
    }
    if (fields.contains("enum")) {
      val vals = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("enum").elements()).asScala.toSeq
      conds += (if (vals.forall(_.isNumber)) numeric(v).isin(vals.map(_.asDouble): _*)
                else stringy(v).isin(vals.map(_.asText): _*))
    }
    if (fields.contains("required")) {
      val reqs = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("required").elements()).asScala.toSeq
      reqs.foreach { r => conds += variantAt(root, s"$path.${r.asText}").isNotNull }
    }
    if (fields.contains("properties")) {
      val props = schema.get("properties")
      scala.jdk.CollectionConverters.IteratorHasAsScala(props.fieldNames()).asScala.foreach { name =>
        val sub = compileInner(props.get(name), root, s"$path.$name")
        // per JSON Schema, properties constrain only when present
        conds += (variantAt(root, s"$path.$name").isNull || sub)
      }
    }
    if (fields.contains("allOf")) {
      scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("allOf").elements()).asScala
        .foreach(sub => conds += compileInner(sub, root, path))
    }
    if (fields.contains("anyOf")) {
      val subs = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("anyOf").elements()).asScala
        .map(sub => compileInner(sub, root, path)).toSeq
      conds += subs.reduceLeft(_ || _)
    }
    if (fields.contains("not"))
      conds += !compileInner(schema.get("not"), root, path)

    val unsupported = fields -- Set("type", "minimum", "maximum", "exclusiveMinimum",
      "exclusiveMaximum", "const", "enum", "required", "properties", "allOf", "anyOf",
      "not", "additionalProperties", "items", "description", "title")
    require(unsupported.isEmpty, s"unsupported JSON Schema keywords: $unsupported")

    conds.result() match {
      case Seq() => lit(true)
      case cs    => cs.reduceLeft(_ && _)
    }
  }

  private def variantAt(root: Column, path: String): Column =
    if (path == "$") root
    else try_variant_get(root, path, "variant")

  /** Per-row type name of the JSON subtree: BIGINT/DOUBLE/DECIMAL for
    * numbers, STRING, BOOLEAN, ARRAY<...>, OBJECT<...>, VOID for null.
    */
  private def typeName(v: Column): Column = schema_of_variant(v)

  private def typeTest(v: Column, t: String): Column = t match {
    case "number"  => v.isNotNull && (typeName(v) === "BIGINT" || typeName(v) === "DOUBLE" ||
                        typeName(v).startsWith("DECIMAL"))
    case "integer" => v.isNotNull && typeName(v) === "BIGINT"
    case "string"  => v.isNotNull && typeName(v) === "STRING"
    case "boolean" => v.isNotNull && typeName(v) === "BOOLEAN"
    case "object"  => v.isNotNull && typeName(v).startsWith("OBJECT")
    case "array"   => v.isNotNull && typeName(v).startsWith("ARRAY")
    case "null"    => v.isNotNull && typeName(v) === "VOID"
    case other     => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  private def numeric(v: Column): Column = v.cast("double")
  private def stringy(v: Column): Column = v.cast("string")
}
