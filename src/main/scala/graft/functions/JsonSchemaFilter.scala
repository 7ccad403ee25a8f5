package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `keep-when` (reference src/step-functions/keep-when.ts:44-55):
  * keep events whose payload validates against a user JSON Schema.
  *
  * The supported schema subset (type / properties / required / numeric
  * ranges / enum / const / anyOf / allOf / oneOf / not / pattern /
  * length / multipleOf / items incl. tuple form / minItems / maxItems /
  * uniqueItems (value identity: 1 == 1.0, member order ignored) /
  * contains / patternProperties / if-then-else / document-local $ref)
  * is compiled ONCE into a tree of JVM closures over an abstract
  * [[JsonView]]; at run time each row is walked exactly once.
  *
  * Two input shapes, one matcher tree:
  *  - a JSON **string** column ([[JsonSchemaMatches]]): the payload is
  *    jackson-parsed once per row, then walked;
  *  - a **struct** column ([[JsonSchemaMatchesStruct]]): the typed
  *    internal row is walked directly — zero serialization, zero
  *    parsing. (Previously struct payloads went through
  *    `to_json` + re-parse per row, which made `keep-when` over
  *    synthesized payloads ~6× slower than its siblings.)
  *
  * Both expressions implement `doGenCode` through a reference object
  * (the [[LshBuckets]] kernel idiom), so the surrounding stage stays
  * inside whole-stage codegen instead of falling back to interpreted
  * row materialization.
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

  /** Compile `schema` to a native single-pass predicate over a typed
    * STRUCT column — the payload is validated directly from Spark's
    * internal representation, with `to_json` member semantics (a null
    * struct field is an ABSENT member, matching Spark's default
    * `ignoreNullFields=true` serialization; array elements keep null).
    */
  def compileStruct(schema: JsonNode, payload: Column): Column = {
    JsonSchemaMatcher.compile(schema)
    ColumnBridge.column(JsonSchemaMatchesStruct(ColumnBridge.expression(payload), schema.toString))
  }

  /** The struct-kernel benchmark's payload synthesizer
    * (`ev_keep_when_str`): `struct(ty, k, arr=[k%5, k%3, (k div 2)%5])`
    * with `k` = the integral JSON member `props.k`, probed with ONE
    * jackson parse per row. Exists because the Column formulation
    * cannot express "parse once": `FilterExec` performs no
    * subexpression elimination and predicate pushdown re-inlines
    * projected aliases, so the payload's four references to a
    * from_json-derived `k` each evaluate their own parse inside the
    * filter condition (measured 5 `from_json` copies in the physical
    * plan, 2.4 s vs 1.0 s at sf0.1). Null semantics mirror
    * `from_json("k BIGINT")`: absent / non-integral / long-overflow /
    * malformed JSON all yield a null `k` (and so a null-element arr),
    * which the matcher treats as an absent member.
    */
  def keepWhenPayload(ty: Column, props: Column): Column =
    ColumnBridge.column(KeepWhenPayload(
      ColumnBridge.expression(ty), ColumnBridge.expression(props)))
}

/** Uniform read-only view over a JSON value, backed either by a parsed
  * jackson tree (string payloads) or by Spark internal data + its
  * `DataType` (struct payloads). The matcher tree is compiled against
  * this interface once and serves both shapes.
  */
sealed trait JsonView {
  def isNumber: Boolean
  def isIntegralNumber: Boolean
  def asDouble: Double
  def isTextual: Boolean
  def asText: String
  def isBoolean: Boolean
  def asBoolean: Boolean
  def isNull: Boolean
  def isObject: Boolean
  def isArray: Boolean
  /** member by name; null when absent (or an absent-by-null struct field) */
  def get(name: String): JsonView
  final def has(name: String): Boolean = get(name) != null
  def fieldNames: Iterator[String]
  def elements: Iterator[JsonView]
  def size: Int
}

object JsonView {

  /** Jackson-backed view (string payloads). */
  final class Node(n: JsonNode) extends JsonView {
    def isNumber: Boolean = n.isNumber
    def isIntegralNumber: Boolean = n.isIntegralNumber
    def asDouble: Double = n.asDouble
    def isTextual: Boolean = n.isTextual
    def asText: String = n.asText
    def isBoolean: Boolean = n.isBoolean
    def asBoolean: Boolean = n.asBoolean
    def isNull: Boolean = n.isNull
    def isObject: Boolean = n.isObject
    def isArray: Boolean = n.isArray
    def get(name: String): JsonView = { val m = n.get(name); if (m == null) null else new Node(m) }
    def fieldNames: Iterator[String] =
      scala.jdk.CollectionConverters.IteratorHasAsScala(n.fieldNames()).asScala
    def elements: Iterator[JsonView] =
      scala.jdk.CollectionConverters.IteratorHasAsScala(n.elements()).asScala.map(new Node(_))
    def size: Int = n.size()
  }

  /** Spark-internal-typed view (struct payloads): walks `InternalRow` /
    * `ArrayData` / `UTF8String` directly against the field types.
    * Member semantics mirror what `to_json` would have produced with
    * Spark defaults: a null STRUCT FIELD is an absent member
    * (`ignoreNullFields=true`); a null ARRAY ELEMENT stays JSON null.
    */
  final class Typed(value: Any, dt: DataType) extends JsonView {
    def isNull: Boolean = value == null
    def isNumber: Boolean = value != null && (dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
           _: DecimalType => true
      case _ => false
    })
    // Representation-sensitive like the string path: to_json writes a
    // double as "1.0", which jackson parses as a non-integral
    // DoubleNode — so Double/Float fields are NEVER `integer`, and a
    // decimal is `integer` iff its scale is 0 (serialized without a
    // fraction). Keeps the two input shapes byte-for-byte equivalent.
    def isIntegralNumber: Boolean = value != null && (dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case d: DecimalType => d.scale == 0
      case _ => false
    })
    def asDouble: Double = dt match {
      case LongType => value.asInstanceOf[Long].toDouble
      case IntegerType => value.asInstanceOf[Int].toDouble
      case ShortType => value.asInstanceOf[Short].toDouble
      case ByteType => value.asInstanceOf[Byte].toDouble
      case DoubleType => value.asInstanceOf[Double]
      case FloatType => value.asInstanceOf[Float].toDouble
      case _: DecimalType => value.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case _ => Double.NaN
    }
    def isTextual: Boolean = value != null && dt == StringType
    def asText: String = value.asInstanceOf[UTF8String].toString
    def isBoolean: Boolean = value != null && dt == BooleanType
    def asBoolean: Boolean = value.asInstanceOf[Boolean]
    def isObject: Boolean = value != null && dt.isInstanceOf[StructType]
    def isArray: Boolean = value != null && dt.isInstanceOf[ArrayType]
    private def struct: StructType = dt.asInstanceOf[StructType]
    private def row: InternalRow = value.asInstanceOf[InternalRow]
    def get(name: String): JsonView =
      if (!isObject) null
      else {
        // linear name scan: payload structs are small, and a per-view
        // hash map would cost more than it saves
        val fs = struct.fields
        var i = 0
        while (i < fs.length) {
          if (fs(i).name == name) {
            // null field == absent member (to_json parity)
            return if (row.isNullAt(i)) null else new Typed(row.get(i, fs(i).dataType), fs(i).dataType)
          }
          i += 1
        }
        null
      }
    def fieldNames: Iterator[String] =
      if (!isObject) Iterator.empty
      else struct.fields.iterator.zipWithIndex.collect { case (f, i) if !row.isNullAt(i) => f.name }
    def elements: Iterator[JsonView] =
      if (!isArray) Iterator.empty
      else {
        val at = dt.asInstanceOf[ArrayType]
        val arr = value.asInstanceOf[ArrayData]
        Iterator.tabulate(arr.numElements()) { i =>
          if (arr.isNullAt(i)) new Typed(null, NullType)
          else new Typed(arr.get(i, at.elementType), at.elementType)
        }
      }
    def size: Int = dt match {
      case _: ArrayType => value.asInstanceOf[ArrayData].numElements()
      case s: StructType => // members present after null-drop
        val r = row; (0 until s.length).count(i => !r.isNullAt(i))
      case _ => 0
    }
  }

  /** Plan-build validation: every type reachable from a struct payload
    * must have a JSON meaning. Rejects maps/binary/timestamps loudly
    * at compile time instead of mid-job.
    */
  def validatePayloadType(dt: DataType): Unit = dt match {
    case s: StructType => s.fields.foreach(f => validatePayloadType(f.dataType))
    case a: ArrayType => validatePayloadType(a.elementType)
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
         StringType | BooleanType | NullType => ()
    case _: DecimalType => ()
    case other => throw new IllegalArgumentException(
      s"keep-when struct payload: unsupported field type $other (no JSON Schema meaning)")
  }
}

/** The schema-subset interpreter: a JSON Schema document compiles to a
  * `JsonView => Boolean` closure tree (one-time cost), evaluated
  * against each payload's root view.
  *
  * Semantics follow the JSON Schema draft the reference validates with:
  * `properties` constrain only when the member is present (a JSON
  * `null` member IS present), numeric range keywords only apply to
  * numbers, `integer` means an integral JSON number, and `required`
  * demands object membership.
  */
object JsonSchemaMatcher {
  type Matcher = JsonView => Boolean

  private val supported = Set("type", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "const", "enum", "required", "properties", "allOf", "anyOf",
    "not", "additionalProperties", "items", "description", "title",
    "pattern", "minLength", "maxLength", "multipleOf", "oneOf",
    "uniqueItems", "contains", "minItems", "maxItems",
    "if", "then", "else", "patternProperties",
    "$ref", "$defs", "definitions", "$schema", "$id")

  /** Canonical value identity for `uniqueItems`/set semantics: JSON
    * Schema compares VALUES (1 == 1.0, object member order ignored),
    * while node equality is type- and representation-sensitive.
    * Numbers normalize to their double, object members sort by name,
    * arrays keep order. Strings and member names are LENGTH-PREFIXED
    * (`s<len>:chars`), so no crafted content can collide with the
    * structural characters of a different value's encoding.
    */
  private def canonical(v: JsonView): String = {
    val sb = new StringBuilder
    def str(tag: Char, s: String): Unit =
      sb.append(tag).append(s.length).append(':').append(s)
    def walk(n: JsonView): Unit =
      if (n.isNumber) { sb.append('n').append(n.asDouble) }
      else if (n.isTextual) str('s', n.asText)
      else if (n.isBoolean) sb.append(if (n.asBoolean) 'T' else 'F')
      else if (n.isNull) sb.append('Z')
      else if (n.isArray) {
        sb.append('[')
        n.elements.foreach { e => walk(e); sb.append(',') }
        sb.append(']')
      } else {
        sb.append('{')
        n.fieldNames.toSeq.sorted.foreach { f =>
          str('f', f); sb.append(':'); walk(n.get(f)); sb.append(',')
        }
        sb.append('}')
      }
    walk(v)
    sb.result()
  }

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
    if (fields.contains("items")) {
      val items = schema.get("items")
      if (items.isArray) {
        // tuple form: position i validates against items[i] when present
        val subs = scala.jdk.CollectionConverters.IteratorHasAsScala(items.elements()).asScala
          .map(compile(_, root, refStack)).toIndexedSeq
        conds += (v => !v.isArray ||
          v.elements.take(subs.length).zipWithIndex.forall { case (e, i) => subs(i)(e) })
      } else {
        val sub = compile(items, root, refStack)
        conds += (v => !v.isArray || v.elements.forall(sub))
      }
    }
    if (fields.contains("contains")) {
      val sub = compile(schema.get("contains"), root, refStack)
      conds += (v => !v.isArray || v.elements.exists(sub))
    }
    if (fields.contains("uniqueItems") && schema.get("uniqueItems").asBoolean) {
      conds += (v => !v.isArray || {
        val seen = scala.collection.mutable.HashSet.empty[String]
        v.elements.forall(e => seen.add(canonical(e)))
      })
    }
    if (fields.contains("minItems")) {
      val n = schema.get("minItems").asInt
      conds += (v => !v.isArray || v.size >= n)
    }
    if (fields.contains("maxItems")) {
      val n = schema.get("maxItems").asInt
      conds += (v => !v.isArray || v.size <= n)
    }
    if (fields.contains("patternProperties")) {
      val pats = schema.get("patternProperties")
      val matchers = scala.jdk.CollectionConverters.IteratorHasAsScala(pats.fieldNames()).asScala.toSeq
        .map { p =>
          ( // unanchored partial match on the member NAME, as ajv
            java.util.regex.Pattern.compile(p),
            compile(pats.get(p), root, refStack))
        }
      conds += (v => !v.isObject || {
        v.fieldNames.forall { name =>
          matchers.forall { case (re, sub) =>
            !re.matcher(name).find() || sub(v.get(name))
          }
        }
      })
    }
    if (fields.contains("if")) {
      val ifM = compile(schema.get("if"), root, refStack)
      val thenM: Matcher =
        if (fields.contains("then")) compile(schema.get("then"), root, refStack) else _ => true
      val elseM: Matcher =
        if (fields.contains("else")) compile(schema.get("else"), root, refStack) else _ => true
      conds += (v => if (ifM(v)) thenM(v) else elseM(v))
    } // then/else without if constrain nothing, per spec

    conds.result() match {
      case Seq()  => _ => true
      case Seq(c) => c
      case cs     => v => cs.forall(_(v))
    }
  }
}

/** One-pass JSON Schema validation of a JSON-string column: parse the
  * payload once, walk the compiled matcher tree once. Codegen calls
  * the kernel through a reference object, so the surrounding stage
  * stays inside whole-stage codegen.
  */
case class JsonSchemaMatches(child: Expression, schemaJson: String)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val matcher: JsonSchemaMatcher.Matcher =
    JsonSchemaMatcher.compile(mapper.readTree(schemaJson))

  def matches(text: UTF8String): Boolean =
    if (text == null) false
    else try matcher(new JsonView.Node(mapper.readTree(text.toString)))
    catch { case _: com.fasterxml.jackson.core.JacksonException => false }

  override def eval(input: InternalRow): Any = matches(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonSchemaMatches", this, classOf[JsonSchemaMatches].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = $ref.matches(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass JSON Schema validation of a typed STRUCT column: the
  * internal row is walked directly against the matcher tree — no
  * serialization, no parsing. Null-field semantics match `to_json`
  * (Spark default `ignoreNullFields=true`): a null struct field is an
  * absent member; a null array element is JSON null.
  */
case class JsonSchemaMatchesStruct(child: Expression, schemaJson: String)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    JsonView.validatePayloadType(child.dataType)
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val matcher: JsonSchemaMatcher.Matcher =
    JsonSchemaMatcher.compile(new ObjectMapper().readTree(schemaJson))
  @transient private lazy val childType: DataType = child.dataType

  def matches(value: Any): Boolean =
    if (value == null) false else matcher(new JsonView.Typed(value, childType))

  override def eval(input: InternalRow): Any = matches(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonSchemaMatchesStruct", this,
      classOf[JsonSchemaMatchesStruct].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = ${c.isNull} ? false : $ref.matches(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Parse-once payload synthesis for the struct-kernel benchmark — see
  * [[JsonSchemaFilter.keepWhenPayload]] for why this cannot be a plain
  * Column expression. Output type:
  * `struct<ty: string, k: bigint, arr: array<bigint>>`.
  */
case class KeepWhenPayload(ty: Expression, props: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = ty
  override def right: Expression = props
  override def nullable: Boolean = false

  override val dataType: DataType = StructType(Seq(
    StructField("ty", StringType, nullable = true),
    StructField("k", LongType, nullable = true),
    StructField("arr", ArrayType(LongType, containsNull = true), nullable = false)))

  @transient private lazy val mapper = new ObjectMapper()

  /** `props.k` as a boxed Long when it is an integral JSON number that
    * fits int64; null otherwise (matches `from_json("k BIGINT")`).
    */
  private def parseK(propsText: UTF8String): java.lang.Long = {
    if (propsText == null) return null
    val tree =
      try mapper.readTree(propsText.toString)
      catch { case _: com.fasterxml.jackson.core.JacksonException => return null }
    if (tree == null || !tree.isObject) return null
    val k = tree.get("k")
    if (k == null || !k.isIntegralNumber || !k.canConvertToLong) null
    else java.lang.Long.valueOf(k.longValue())
  }

  def build(tyVal: UTF8String, propsVal: UTF8String): InternalRow = {
    val k = parseK(propsVal)
    val arr: Array[Any] =
      if (k == null) Array(null, null, null)
      else {
        val kv = k.longValue()
        Array(kv % 5, kv % 3, (kv / 2) % 5)
      }
    InternalRow(tyVal, k, new org.apache.spark.sql.catalyst.util.GenericArrayData(arr))
  }

  override def eval(input: InternalRow): Any =
    build(ty.eval(input).asInstanceOf[UTF8String],
      props.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("keepWhenPayload", this, classOf[KeepWhenPayload].getName)
    val t = ty.genCode(ctx)
    val p = props.genCode(ctx)
    ev.copy(
      code = code"""
        ${t.code}
        ${p.code}
        InternalRow ${ev.value} = $ref.build(
          ${t.isNull} ? null : ${t.value}, ${p.isNull} ? null : ${p.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(ty = newLeft, props = newRight)
}
