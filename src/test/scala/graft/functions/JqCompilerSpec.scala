package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.BatchCompiler
import graft.spec.Spec

/** Differential check: the compiled jq tier must agree with the real
  * jq subprocess tier on the same pipeline and input (numeric
  * payloads; jq renders 24 where the compiled tier renders 24.0, so
  * comparison happens on parsed values).
  */
class JqCompilerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val baseYaml =
    """name: p
      |steps:
      |  transform:
      |    flatmap:
      |      send-receive-jq: '.[] | select(.d.k > 10 and .n != "skip.me") | {n: "out", d: {v: (.d.k * 2), w: (.d.k - 1)}}'
      |""".stripMargin

  private def run(yaml: String) = {
    import spark.implicits._
    val rows = Seq(
      ("a.b", """{"k": 5}"""), ("a.c", """{"k": 20}"""),
      ("skip.me", """{"k": 99}"""), ("a.d", """{"k": 11}"""))
    val input = rows.zipWithIndex
      .map { case ((n, d), i) => (n, d, i.toLong, 1000.0 + i) }
      .toDF("n", "d", "__seq", "arrival")
    val tpl = Spec.parseYaml(yaml)
    val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
    BatchCompiler.compile(spark, tpl, stamped).output
      .select(col("n"),
        get_json_object(col("d"), "$.v").cast("double").as("v"),
        get_json_object(col("d"), "$.w").cast("double").as("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
  }

  test("per-event select + object construction: compiled tier == jq subprocess tier") {
    val viaJq = run(baseYaml)
    val viaCompiled = run("jq-tier: compiled\n" + baseYaml)
    assert(viaJq == Set(("out", 40.0, 19.0), ("out", 22.0, 10.0)))
    assert(viaCompiled == viaJq)
  }

  test("compiled tonumber/tostring fail LOUDLY outside the exact envelope instead of silently diverging from jq") {
    import spark.implicits._
    def outOf(expr: String, n: String, d: String): Array[org.apache.spark.sql.Row] = {
      val Some(JqCompiler.CompiledPerEvent(pe)) = JqCompiler.tryCompile(expr): @unchecked
      val df = Seq((n, d)).toDF("n", "d")
      pe.filter.fold(df)(df.filter).select(pe.outName, pe.outPayloadJson).collect()
    }
    // in-envelope values evaluate exactly
    assert(outOf(""".[] | {n: "x", d: {v: (.d.ns | tonumber)}}""", "a", """{"ns":"42"}""")
      .map(_.getString(1)).head == """{"v":42.0}""")
    assert(outOf(""".[] | {n: "x", d: {s: (.d.m | tostring)}}""", "a", """{"m":3.5}""")
      .map(_.getString(1)).head == """{"s":"3.5"}""")
    // jq RAISES on tonumber of a non-numeric string; the compiled tier
    // must not quietly emit null — it raises with a subprocess-tier hint
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Exception](
      outOf(""".[] | {n: "x", d: {v: (.d.ns | tonumber)}}""", "a", """{"ns":"garbage"}"""))
    assert(chainMsg(e1).contains("subprocess tier"), chainMsg(e1))
    // 1e20 would render Java-style ("1.0E20") where jq prints plain —
    // silent wrong output pre-fix; now a loud error
    val e2 = intercept[Exception](
      outOf(""".[] | {n: "x", d: {s: (.d.m | tostring)}}""", "a", """{"m":1e20}"""))
    assert(chainMsg(e2).contains("envelope"), chainMsg(e2))
  }

  test("tryCompile falls back (None) outside the subset") {
    assert(JqCompiler.tryCompile(".[] | .d.k | tostring").isEmpty)
    assert(JqCompiler.tryCompile("group_by(.n)").isEmpty)
    assert(JqCompiler.tryCompile(".[] | {n: \"x\", d: .d.k}").isDefined)
    assert(JqCompiler.tryCompile(".[] | {n: \"x\", extra: 1}").isEmpty) // invalid envelope
    assert(JqCompiler.tryCompile("{n: \"agg\", d: {s: (map(.d.k) | add), c: length}}").isDefined)
  }

  test("regex builtins: dialect guard and jq-bug refusals stay on the subprocess tier") {
    def pe(body: String) = s""".[] | {n: "x", d: {a: ($body)}}"""
    // compiled: common-dialect regexes
    assert(JqCompiler.tryCompile(pe(""".d.s | test("^a[bc]+$")""")).isDefined)
    assert(JqCompiler.tryCompile(pe(""".d.s | gsub("a+"; "X")""")).isDefined)
    assert(JqCompiler.tryCompile(pe(""".d.s | sub("a*"; "X")""")).isDefined)
    // refused: gsub on an empty-matchable pattern (jq 1.6 infinite-loops
    // there — the compiled tier must not succeed where jq hangs)
    assert(JqCompiler.tryCompile(pe(""".d.s | gsub("a*"; "X")""")).isEmpty)
    // refused: constructs outside the Java↔Oniguruma common dialect
    assert(JqCompiler.tryCompile(pe(""".d.s | test("(?i)abc")""")).isEmpty)     // inline flags
    assert(JqCompiler.tryCompile(pe(""".d.s | test("a(?=b)")""")).isEmpty)      // lookahead
    assert(JqCompiler.tryCompile(pe(""".d.s | test("a*?b")""")).isEmpty)        // lazy quantifier
    assert(JqCompiler.tryCompile(pe(""".d.s | test("\\p{L}+")""")).isEmpty)     // unicode property
    assert(JqCompiler.tryCompile(pe(""".d.s | test("[ab")""")).isEmpty)         // invalid regex
    // min/max only after an array-producing stage; length only on a
    // statically-string chain (variant-start stays subprocess)
    assert(JqCompiler.tryCompile(pe(""".d.s | min""")).isEmpty)
    assert(JqCompiler.tryCompile(pe(""".d.s | split(",") | min""")).isDefined)
    assert(JqCompiler.tryCompile(pe(""".d.s | length""")).isEmpty)
    assert(JqCompiler.tryCompile(pe(""".n | length""")).isDefined)
    // sort_by/min_by/max_by are not in the compiled subset
    assert(JqCompiler.tryCompile(pe(""".d.s | split(",") | sort_by(.)""")).isEmpty)
    // test flags: only ASCII "i" compiles
    assert(JqCompiler.tryCompile(pe(""".d.s | test("AL"; "i")""")).isDefined)
    assert(JqCompiler.tryCompile(pe(""".d.s | test("al"; "x")""")).isEmpty)     // other flags
    assert(JqCompiler.tryCompile(pe(""".d.s | test("Ärm"; "i")""")).isEmpty)    // non-ASCII fold
    // '&' inside a class: Java [a&&b] is set intersection, Oniguruma
    // two literal ampersands — refused to the subprocess tier
    assert(JqCompiler.tryCompile(pe(""".d.s | test("[a&&b]")""")).isEmpty)
    assert(JqCompiler.tryCompile(pe(""".d.s | test("[a&b]")""")).isEmpty)
    // chain comparison operands need a STATICALLY kind-aligned partner:
    // a literal compiles, a bare path (runtime kind unknown — jq would
    // apply cross-type ordering) refuses to the subprocess tier
    assert(JqCompiler.tryCompile(".[] | select((.n | length) > 3) | {n: \"x\", d: {a: 1}}").isDefined)
    assert(JqCompiler.tryCompile(".[] | select((.n | length) > .d.x) | {n: \"x\", d: {a: 1}}").isEmpty)
  }

  private val stressYaml =
    """name: p
      |steps:
      |  odds:
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq:
      |        jq-expr: '.[].d | if fmod(.; 2) == 0 then empty else . end'
      |        wrap: "not.multiples.of.two"
      |""".stripMargin

  private def runStress(yaml: String) = {
    import spark.implicits._
    val input = (1 to 20).map(i => ("gen", i.toString, i.toLong, 1000.0 + i))
      .toDF("n", "d", "__seq", "arrival")
    val tpl = Spec.parseYaml(yaml)
    val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
    BatchCompiler.compile(spark, tpl, stamped).output
      .select("n", "d").collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._2.toInt).toList
  }

  test("stress-test wrapped filter: compiled tier == jq subprocess tier (reference examples/stress-test)") {
    val viaJq = runStress(stressYaml)
    val viaCompiled = runStress("jq-tier: compiled\n" + stressYaml)
    assert(viaJq == (1 to 20 by 2).map(i => ("not.multiples.of.two", i.toString)).toList)
    assert(viaCompiled == viaJq) // identical text, incl. jq's number formatting
    // and the compiled tier really engaged (expression is in the subset)
    assert(JqCompiler.tryCompileWrapped(".[].d | if fmod(.; 2) == 0 then empty else . end").isDefined)
  }

  test("tryCompileWrapped scope: value rebind + drops in, computed outputs out") {
    assert(JqCompiler.tryCompileWrapped(".[].d.k | select(. > 3)").isDefined)
    assert(JqCompiler.tryCompileWrapped(".[].d | if . < 0 then . else empty end").isDefined)
    // computed final values would re-render jq's number text — fall back
    assert(JqCompiler.tryCompileWrapped(".[].d | . * 2").isEmpty)
    assert(JqCompiler.tryCompileWrapped(".[] | tostring").isEmpty)
  }

  test("malformed string literals fail compile cleanly instead of hanging") {
    // unterminated literal previously looped forever in parseString
    assert(JqCompiler.tryCompile(".[] | select(.n == \"unterminated)").isEmpty)
    assert(JqCompiler.tryCompile(".[] | select(.n == \"bad\\").isEmpty)
    assert(JqCompiler.tryCompile(".[] | select(.n == \"bad\\q\")").isEmpty) // unknown escape
  }

  test("string escapes decode to their characters, not their escape letters") {
    import spark.implicits._
    // stays inside the compiled subset (no subprocess fallback involved)
    assert(JqCompiler.tryCompile(""".[] | select(.n == "tab\there") | {n: "hit", d: {z: 1}}""").isDefined)
    val input = Seq(("tab\there", "{}", 0L, 1000.0), ("other", "{}", 1L, 1001.0))
      .toDF("n", "d", "__seq", "arrival")
    val tpl = Spec.parseYaml(
      """name: p
        |jq-tier: compiled
        |steps:
        |  t:
        |    flatmap:
        |      send-receive-jq: '.[] | select(.n == "tab\there") | {n: "hit", d: {z: 1}}'
        |""".stripMargin)
    val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
    val out = BatchCompiler.compile(spark, tpl, stamped).output.select("n")
      .collect().map(_.getString(0)).toList
    assert(out == List("hit"))
  }
}
