package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Generative cross-validation of the compiled JSON-Schema predicate:
  * an independent interpreted validator (a direct reading of the spec,
  * written against jackson trees) evaluates random schema/payload
  * pairs, and the compiled Column must agree on every one.
  */
class JsonSchemaFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val mapper = new ObjectMapper()

  /** Reference validator: the JSON-Schema subset, interpreted. */
  private def validates(schema: JsonNode, value: Option[JsonNode]): Boolean = {
    def fields(n: JsonNode) = scala.jdk.CollectionConverters
      .IteratorHasAsScala(n.fieldNames()).asScala.toSeq
    var ok = true
    if (schema.has("type")) {
      val t = schema.get("type").asText
      ok &= value.exists { v =>
        t match {
          case "number"  => v.isNumber
          case "integer" => v.isIntegralNumber
          case "string"  => v.isTextual
          case "boolean" => v.isBoolean
          case "object"  => v.isObject
          case "array"   => v.isArray
          case "null"    => v.isNull
        }
      }
    }
    def num = value.filter(_.isNumber).map(_.asDouble)
    if (schema.has("minimum")) ok &= num.exists(_ >= schema.get("minimum").asDouble)
    if (schema.has("maximum")) ok &= num.exists(_ <= schema.get("maximum").asDouble)
    if (schema.has("exclusiveMaximum")) ok &= num.exists(_ < schema.get("exclusiveMaximum").asDouble)
    if (schema.has("required"))
      ok &= scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("required").elements())
        .asScala.forall(r => value.exists(v => v.isObject && v.has(r.asText)))
    if (schema.has("properties")) {
      val props = schema.get("properties")
      fields(props).foreach { name =>
        val sub = value.flatMap(v => Option(v.get(name)))
        // properties constrain only when present
        if (sub.isDefined) ok &= validates(props.get(name), sub)
      }
    }
    if (schema.has("not")) ok &= !validates(schema.get("not"), value)
    if (schema.has("anyOf"))
      ok &= scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("anyOf").elements())
        .asScala.exists(s => validates(s, value))
    if (schema.has("oneOf"))
      ok &= scala.jdk.CollectionConverters.IteratorHasAsScala(schema.get("oneOf").elements())
        .asScala.count(s => validates(s, value)) == 1
    // string/number keywords apply only to values of the matching type (spec §6)
    if (schema.has("pattern")) {
      val re = java.util.regex.Pattern.compile(schema.get("pattern").asText)
      ok &= value.forall(v => !v.isTextual || re.matcher(v.asText).find())
    }
    if (schema.has("minLength"))
      ok &= value.forall(v => !v.isTextual ||
        v.asText.codePointCount(0, v.asText.length) >= schema.get("minLength").asInt)
    if (schema.has("maxLength"))
      ok &= value.forall(v => !v.isTextual ||
        v.asText.codePointCount(0, v.asText.length) <= schema.get("maxLength").asInt)
    if (schema.has("multipleOf")) {
      val m = schema.get("multipleOf").asDouble
      ok &= value.forall(v => !v.isNumber || { val q = v.asDouble / m; q == math.floor(q) && !q.isInfinite })
    }
    ok
  }

  test("compiled predicate agrees with the interpreted validator on random pairs") {
    import spark.implicits._
    // fixed seed for CI determinism; GRAFT_FUZZ_SEED overrides for sweeps
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(42L))

    def randomLeafSchema(): String = rnd.nextInt(9) match {
      case 0 => """{"type":"integer"}"""
      case 1 => s"""{"type":"number","minimum":${rnd.nextInt(50)}}"""
      case 2 => s"""{"type":"number","exclusiveMaximum":${rnd.nextInt(80)}}"""
      case 3 => """{"type":"string"}"""
      case 4 => """{"type":"boolean"}"""
      case 5 => s"""{"pattern":"${Seq("^x", "y$", "[0-9]+", "xy|yx")(rnd.nextInt(4))}"}"""
      case 6 => s"""{"minLength":${rnd.nextInt(4)}}"""
      case 7 => s"""{"maxLength":${rnd.nextInt(4)}}"""
      case 8 => s"""{"multipleOf":${rnd.nextInt(4) + 1}}"""
    }
    def randomSchema(): String = rnd.nextInt(5) match {
      case 0 => s"""{"type":"object","required":["k"],"properties":{"k":${randomLeafSchema()}}}"""
      case 1 => s"""{"type":"object","properties":{"k":${randomLeafSchema()},"s":${randomLeafSchema()}}}"""
      case 2 => s"""{"type":"object","not":{"required":["z"]}}"""
      case 3 => s"""{"type":"object","anyOf":[{"required":["k"]},{"required":["s"]}]}"""
      case 4 => s"""{"type":"object","oneOf":[{"properties":{"k":${randomLeafSchema()}}},{"required":["s"]}]}"""
    }
    def randomPayload(): String = rnd.nextInt(11) match {
      case 0 => s"""{"k":${rnd.nextInt(100)}}"""
      case 1 => s"""{"k":${rnd.nextInt(100)}.5}"""
      case 2 => s"""{"k":"${rnd.nextInt(100)}"}"""
      case 3 => s"""{"s":"x","k":true}"""
      case 4 => """{"z":1}"""
      case 5 => """{}"""
      case 6 => s"""{"k":null}"""
      case 7 => s"""{"s":"y"}"""
      case 8 => s"""{"k":"${Seq("", "x", "xy", "yx", "xyx", "x1y")(rnd.nextInt(6))}"}"""
      case 9 => s"""{"k":${rnd.nextInt(12)},"s":"${"x" * rnd.nextInt(5)}"}"""
      case 10 => s"""{"s":"😀${"y" * rnd.nextInt(3)}"}"""
    }

    (1 to 40).foreach { _ =>
      val schemaText = randomSchema()
      val schema = mapper.readTree(schemaText)
      val payloads = (1 to 25).map(_ => randomPayload())
      val df = payloads.toDF("d")
      val kept = df.filter(JsonSchemaFilter.compile(schema, col("d")))
        .collect().map(_.getString(0)).toSet
      payloads.distinct.foreach { p =>
        val expected = validates(schema, Some(mapper.readTree(p)))
        assert(kept.contains(p) == expected,
          s"schema=$schemaText payload=$p expected=$expected")
      }
    }
  }

  test("$ref: local pointers resolve to the same predicate as the inlined schema") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val leaves = Seq(
      """{"type":"integer","minimum":3}""",
      """{"type":"string","minLength":2}""",
      """{"multipleOf":2}""",
      """{"pattern":"^x"}""")
    val payloads = (1 to 60).map(_ => rnd.nextInt(6) match {
      case 0 => s"""{"k":${rnd.nextInt(10)}}"""
      case 1 => s"""{"k":"${"x" * rnd.nextInt(4)}"}"""
      case 2 => """{}"""
      case 3 => """{"k":null}"""
      case 4 => s"""{"k":${rnd.nextInt(10)}.5}"""
      case 5 => s"""{"k":"y${"x" * rnd.nextInt(3)}"}"""
    })
    val df = payloads.toDF("d")
    leaves.foreach { leaf =>
      val inline = mapper.readTree(
        s"""{"type":"object","required":["k"],"properties":{"k":$leaf}}""")
      // via $defs, and via a second-hop ref (ref to a ref)
      val refd = mapper.readTree(
        s"""{"$$defs":{"leaf":$leaf,"hop":{"$$ref":"#/$$defs/leaf"}},
            "type":"object","required":["k"],
            "properties":{"k":{"$$ref":"#/$$defs/hop"}}}""")
      val a = df.filter(JsonSchemaFilter.compile(inline, col("d"))).collect().map(_.getString(0)).toSeq
      val b = df.filter(JsonSchemaFilter.compile(refd, col("d"))).collect().map(_.getString(0)).toSeq
      assert(a == b, s"leaf=$leaf")
    }
    // draft-07: $ref replaces siblings — the sibling minimum must be ignored
    val replaced = mapper.readTree(
      """{"$defs":{"any":{}},
         "type":"object",
         "properties":{"k":{"$ref":"#/$defs/any","minimum":100}}}""")
    val kept = df.filter(JsonSchemaFilter.compile(replaced, col("d")))
      .collect().map(_.getString(0)).toSet
    assert(kept == payloads.toSet, "sibling keyword beside $ref must be ignored (draft-07)")
  }

  test("array/applicator keywords: items, uniqueItems, contains, patternProperties, if/then/else") {
    def m(schema: String) = JsonSchemaMatcher.compile(mapper.readTree(schema))
    def j(s: String): JsonView = new JsonView.Node(mapper.readTree(s))
    // items, single-schema form; non-arrays are unconstrained (spec §6)
    val ints = m("""{"items":{"type":"integer"}}""")
    assert(ints(j("[1,2,3]")) && !ints(j("""[1,"x"]""")) && ints(j("\"notarray\"")))
    // tuple form: per-position, extra elements unconstrained
    val tup = m("""{"items":[{"type":"integer"},{"type":"string"}]}""")
    assert(tup(j("""[1,"a",true]""")) && !tup(j("""["a",1]""")) && tup(j("[1]")))
    val sz = m("""{"minItems":2,"maxItems":3}""")
    assert(!sz(j("[1]")) && sz(j("[1,2]")) && !sz(j("[1,2,3,4]")))
    // uniqueItems is VALUE identity: 1 == 1.0, member order ignored
    val uniq = m("""{"uniqueItems":true}""")
    assert(uniq(j("[1,2,3]")))
    assert(!uniq(j("[1,1.0]")), "1 and 1.0 are the same JSON value")
    assert(!uniq(j("""[{"a":1,"b":2},{"b":2,"a":1}]""")), "member order must not matter")
    assert(uniq(j("[[1,2],[2,1]]")), "array element order does matter")
    val has2 = m("""{"contains":{"const":2}}""")
    assert(has2(j("[1,2,3]")) && !has2(j("[1,3]")))
    val pp = m("""{"patternProperties":{"^n":{"type":"integer"}}}""")
    assert(pp(j("""{"n1":3,"other":"x"}""")) && !pp(j("""{"n1":"notint"}""")))
    val ite = m(
      """{"if":{"properties":{"t":{"const":"a"}},"required":["t"]},
          "then":{"properties":{"k":{"minimum":10}}},
          "else":{"properties":{"k":{"maximum":5}}}}""")
    assert(ite(j("""{"t":"a","k":10}""")) && !ite(j("""{"t":"a","k":9}""")))
    assert(ite(j("""{"t":"b","k":5}""")) && !ite(j("""{"t":"b","k":6}""")))
  }

  test("struct payloads: zero-parse kernel agrees with to_json + string kernel row-for-row") {
    import org.apache.spark.sql.functions.{array, expr, lit, struct, to_json, when}
    import spark.implicits._
    val schema = mapper.readTree(
      """{"type":"object","required":["ty","k"],
         "properties":{
           "ty":{"type":"string","pattern":"^(a|b)","minLength":2,"maxLength":6},
           "k":{"type":"integer","minimum":3,"multipleOf":2},
           "x":{"type":"number","exclusiveMaximum":0.75},
           "arr":{"type":"array","items":{"type":"integer","minimum":0},
                  "minItems":2,"uniqueItems":true,"contains":{"const":1}},
           "sub":{"type":"object","required":["m"],
                  "properties":{"m":{"enum":["p","q"]}}}},
         "patternProperties":{"^k":{"exclusiveMinimum":0}},
         "if":{"required":["ty"],"properties":{"ty":{"pattern":"^a"}}},
         "then":{"properties":{"k":{"maximum":40}}},
         "else":{"properties":{"k":{"maximum":90}}}}""")
    // 200 rows covering: both ty prefixes + a failing one, null fields
    // (absent members), doubles that look integral, arrays with nulls,
    // nested structs with null members
    val df = spark.range(200).toDF("i")
      .withColumn("ty", when($"i" % 7 === 0, lit(null).cast("string"))
        .otherwise(expr("concat(case when i % 3 = 0 then 'a' when i % 3 = 1 then 'b' else 'zz' end, 'x', i % 100)")))
      .withColumn("k", when($"i" % 5 === 0, lit(null).cast("long")).otherwise($"i" % 97))
      .withColumn("x", when($"i" % 4 === 0, ($"i" % 3).cast("double"))
        .otherwise($"i".cast("double") / 16.0))
      .withColumn("arr", when($"i" % 6 === 0, lit(null).cast("array<long>"))
        .otherwise(array($"i" % 4, $"i" % 3, when($"i" % 11 === 0, lit(null).cast("long")).otherwise($"i" % 5))))
      .withColumn("sub", when($"i" % 8 === 0, lit(null))
        .otherwise(struct(when($"i" % 9 === 0, lit(null).cast("string"))
          .otherwise(expr("case when i % 2 = 0 then 'p' else 'r' end")).as("m"))))
      .withColumn("payload", struct($"ty", $"k", $"x", $"arr", $"sub"))
    val viaStruct = df.withColumn("ok", JsonSchemaFilter.compileStruct(schema, col("payload")))
      .select($"i", $"ok").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaJson = df.withColumn("ok", JsonSchemaFilter.compile(schema, to_json(col("payload"))))
      .select($"i", $"ok").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaStruct.size == 200)
    assert(viaStruct == viaJson, {
      val diff = viaStruct.collect { case (i, v) if viaJson(i) != v => i }.toSeq.sorted
      s"struct/json kernels disagree on rows $diff"
    })
    // the schema above actually discriminates: both outcomes occur
    assert(viaStruct.values.exists(identity) && viaStruct.values.exists(!_))
    // unsupported payload field types fail at plan build, not mid-job
    assertThrows[IllegalArgumentException] {
      df.withColumn("bad", struct(expr("map('a', 1)").as("m")))
        .filter(JsonSchemaFilter.compileStruct(mapper.readTree("""{"type":"object"}"""), col("bad")))
        .collect()
    }
  }

  test("keepWhenPayload kernel equals the plain-Column payload synthesis row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // adversarial props: integral / float / string / huge / missing k,
    // malformed JSON, non-object roots, null props
    val props = Seq(
      """{"k":42}""", """{"k":-7}""", """{"k":0}""", """{"k":1.5}""",
      """{"k":"12"}""", """{"k":true}""", """{"k":null}""", """{"j":3}""",
      """{"k":9223372036854775807}""", """{"k":99999999999999999999999}""",
      """not json""", """[1,2,3]""", """"str"""", null)
    val df = props.zipWithIndex
      .map { case (p, i) => (i.toLong, s"ty$i", p) }.toDF("i", "event_type", "props")
    val kCol = from_json(col("props"),
      org.apache.spark.sql.types.DataType.fromDDL("k BIGINT")
        .asInstanceOf[org.apache.spark.sql.types.StructType]).getField("k")
    val viaColumns = df
      .withColumn("k", kCol)
      .select($"i", struct(col("event_type").as("ty"), col("k"),
        array(col("k") % 5, col("k") % 3, expr("k div 2") % 5).as("arr")).as("payload"))
    val viaKernel = df
      .select($"i", JsonSchemaFilter.keepWhenPayload(col("event_type"), col("props")).as("payload"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"i", to_json($"payload").as("j")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = rows(viaColumns); val b = rows(viaKernel)
    assert(a == b, {
      val diff = a.collect { case (i, v) if b(i) != v => s"$i: cols=$v kernel=${b(i)}" }
      s"payload synthesis disagrees: ${diff.mkString("; ")}"
    })
  }

  test("$ref: recursion, dangling and external refs fail loudly at plan build") {
    def bad(schema: String): Unit =
      assertThrows[IllegalArgumentException] {
        JsonSchemaFilter.compile(mapper.readTree(schema), col("d"))
      }
    bad("""{"$defs":{"a":{"$ref":"#/$defs/b"},"b":{"$ref":"#/$defs/a"}},
           "properties":{"k":{"$ref":"#/$defs/a"}}}""")
    bad("""{"properties":{"k":{"$ref":"#/$defs/missing"}}}""")
    bad("""{"properties":{"k":{"$ref":"https://example.com/schema.json"}}}""")
    bad("""{"properties":{"k":{"$ref":"#"}},"$ref":"#"}""")
  }
}
