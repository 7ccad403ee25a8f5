package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** `keep-when` (reference src/step-functions/keep-when.ts:44-55):
  * keep events whose payload validates against a user JSON Schema.
  *
  * The supported schema subset (type / properties / required / numeric
  * ranges / enum / const / anyOf / allOf / oneOf / not / pattern /
  * length / multipleOf / document-local $ref) is compiled ONCE into a
  * tree of JVM closures over jackson nodes; at run time each row is
  * parsed exactly once and walked exactly once by [[JsonSchemaMatches]].
  * (The previous implementation composed per-leaf VARIANT column
  * predicates — `schema_of_variant` is interpreted in Spark 4, and the
  * repeated per-leaf evaluation made this the slowest step in the
  * engine. One native expression is both the fast path and the simple
  * one.)
  *
  * Unsupported keywords throw at compile time — callers see it at plan
  * build, not mid-job. Malformed payload JSON fails validation, same as
  * ajv in the reference.
  */
object JsonSchemaFilter {

  /** Compile `schema` to a native single-pass predicate over `payload`
    * (a JSON string column).
    */
  def compile(schema: JsonNode, payload: Column): Column = {
    JsonSchemaMatcher.compile(schema) // validate keywords eagerly at plan build
    ColumnBridge.column(JsonSchemaMatches(ColumnBridge.expression(payload), schema.toString))
  }
}

/** The schema-subset interpreter: a JSON Schema document compiles to a
  * `JsonNode => Boolean` closure tree (one-time cost), evaluated against
  * each payload's parsed root.
  *
  * Semantics follow the JSON Schema draft the reference validates with:
  * `properties` constrain only when the member is present (a JSON
  * `null` member IS present), numeric range keywords only apply to
  * numbers, `integer` means an integral JSON number, and `required`
  * demands object membership.
  */
object JsonSchemaMatcher {
  type Matcher = JsonNode => Boolean

  private val supported = Set("type", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "const", "enum", "required", "properties", "allOf", "anyOf",
    "not", "additionalProperties", "items", "description", "title",
    "pattern", "minLength", "maxLength", "multipleOf", "oneOf",
    "$ref", "$defs", "definitions", "$schema", "$id")

  def compile(schema: JsonNode): Matcher = compile(schema, schema, Set.empty)

  /** Resolve a local JSON Pointer (`#`, `#/$defs/x`, `#/definitions/x`,
    * any `#/`-path) against the root schema document, with the standard
    * `~0`/`~1` unescaping.
    */
  private def resolvePointer(root: JsonNode, ref: String): JsonNode =
    if (ref == "#") root
    else ref.stripPrefix("#/").split("/").foldLeft(root) { (n, seg0) =>
      val seg = seg0.replace("~1", "/").replace("~0", "~")
      val next = if (n.isArray && seg.nonEmpty && seg.forall(_.isDigit)) n.get(seg.toInt) else n.get(seg)
      require(next != null, s"JSON Schema ref '$ref' does not resolve (missing '$seg')")
      next
    }

  private def compile(schema: JsonNode, root: JsonNode, refStack: Set[String]): Matcher = {
    require(schema.isObject, s"unsupported schema node: $schema")
    val fields = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.fieldNames()).asScala.toSet
    val unsupported = fields -- supported
    require(unsupported.isEmpty, s"unsupported JSON Schema keywords: $unsupported")

    // draft-07 semantics (ajv's default, what the reference runs): a
    // $ref REPLACES its sibling keywords. Only document-local pointers
    // are supported, and recursion fails loudly at plan build like
    // every other unsupported form.
    if (fields.contains("$ref")) {
      val ref = schema.get("$ref").asText
      require(ref == "#" || ref.startsWith("#/"),
        s"only document-local JSON Schema refs are supported, got '$ref'")
      require(!refStack.contains(ref), s"recursive JSON Schema ref unsupported: '$ref'")
      return compile(resolvePointer(root, ref), root, refStack + ref)
    }

    val conds = Seq.newBuilder[Matcher]

    if (fields.contains("type")) {
      val t = schema.get("type").asText
      val test: Matcher = t match {
        case "number"  => _.isNumber
        case "integer" => _.isIntegralNumber
        case "string"  => _.isTextual
        case "boolean" => _.isBoolean
        case "object"  => _.isObject
        case "array"   => _.isArray
        case "null"    => _.isNull
        case other     => throw new IllegalArgumentException(s"unsupported type: $other")
      }
      conds += test
    }
    def numericBound(key: String, cmp: (Double, Double) => Boolean): Unit =
      if (fields.contains(key)) {
        val bound = schema.get(key).asDouble
        conds += (v => v.isNumber && cmp(v.asDouble, bound))
      }
    numericBound("minimum", _ >= _)
    numericBound("maximum", _ <= _)
    numericBound("exclusiveMinimum", _ > _)
    numericBound("exclusiveMaximum", _ < _)

    if (fields.contains("const")) {
      val c = schema.get("const")
      conds += (if (c.isNumber) { val d = c.asDouble; v => v.isNumber && v.asDouble == d }
                else { val s = c.asText; v => v.isTextual && v.asText == s })
    }
    if (fields.contains("enum")) {
      val vals = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("enum").elements()).asScala.toSeq
      conds += (if (vals.forall(_.isNumber)) {
                  val ds = vals.map(_.asDouble).toSet
                  v => v.isNumber && ds.contains(v.asDouble)
                } else {
                  val ss = vals.map(_.asText).toSet
                  v => v.isTextual && ss.contains(v.asText)
                })
    }
    if (fields.contains("required")) {
      val reqs = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("required").elements())
        .asScala.map(_.asText).toSeq
      conds += (v => v.isObject && reqs.forall(v.has))
    }
    if (fields.contains("properties")) {
      val props = schema.get("properties")
      scala.jdk.CollectionConverters.IteratorHasAsScala(props.fieldNames()).asScala.toSeq.foreach { name =>
        val sub = compile(props.get(name), root, refStack)
        // per JSON Schema, properties constrain only when present
        conds += (v => { val m = v.get(name); m == null || sub(m) })
      }
    }
    if (fields.contains("allOf")) {
      scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("allOf").elements()).asScala.toSeq
        .foreach(s => conds += compile(s, root, refStack))
    }
    if (fields.contains("anyOf")) {
      val subs = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("anyOf").elements())
        .asScala.map(compile(_, root, refStack)).toSeq
      conds += (v => subs.exists(_(v)))
    }
    if (fields.contains("pattern")) {
      // unanchored partial match, as ajv/ECMA-262 `RegExp.test`
      val re = java.util.regex.Pattern.compile(schema.get("pattern").asText)
      conds += (v => !v.isTextual || re.matcher(v.asText).find())
    }
    if (fields.contains("minLength")) {
      val n = schema.get("minLength").asInt
      // length counts Unicode code points, not UTF-16 units (spec §6.3)
      conds += (v => !v.isTextual || { val s = v.asText; s.codePointCount(0, s.length) >= n })
    }
    if (fields.contains("maxLength")) {
      val n = schema.get("maxLength").asInt
      conds += (v => !v.isTextual || { val s = v.asText; s.codePointCount(0, s.length) <= n })
    }
    if (fields.contains("multipleOf")) {
      val m = schema.get("multipleOf").asDouble
      // ajv's default check: value/multipleOf is integral
      conds += (v => !v.isNumber || { val q = v.asDouble / m; q == math.floor(q) && !q.isInfinite })
    }
    if (fields.contains("oneOf")) {
      val subs = scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("oneOf").elements())
        .asScala.map(compile(_, root, refStack)).toSeq
      conds += (v => subs.count(_(v)) == 1)
    }
    if (fields.contains("not")) {
      val sub = compile(schema.get("not"), root, refStack)
      conds += (v => !sub(v))
    }

    conds.result() match {
      case Seq()  => _ => true
      case Seq(c) => c
      case cs     => v => cs.forall(_(v))
    }
  }
}

/** One-pass JSON Schema validation of a JSON-string column: parse the
  * payload once, walk the compiled matcher tree once. The jackson parse
  * dominates the per-row cost, so `CodegenFallback` (the repo-standard
  * idiom for opaque kernels, see [[ShingleHashes]]) costs nothing
  * measurable; the surrounding stage stays codegen'd.
  */
case class JsonSchemaMatches(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val matcher: JsonSchemaMatcher.Matcher =
    JsonSchemaMatcher.compile(mapper.readTree(schemaJson))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else {
      val text = v.asInstanceOf[UTF8String].toString
      try matcher(mapper.readTree(text))
      catch { case _: com.fasterxml.jackson.core.JacksonException => false }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
