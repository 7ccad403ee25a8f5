package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spec.Spec

/** End-to-end pipeline compilation goldens, incl. the window-semantics
  * vectors of the reference's test suite (reference __tests__/step.ts)
  * driven through YAML + jq subprocess.
  */
class BatchCompilerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** Event DataFrame from (name, payloadJson) with arrival order. */
  private def events(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    val df = rows.zipWithIndex
      .map { case ((n, d), i) => (n, d, i.toLong, 1000.0 + i) }
      .toDF("n", "d", "__seq", "arrival")
    df
  }

  private def run(yaml: String, input: DataFrame): BatchCompiler.Compiled = {
    val tpl = Spec.parseYaml(yaml)
    val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
    BatchCompiler.compile(spark, tpl, stamped)
  }

  test("send-sink jq receives the step VECTOR as one JSON array line (reference processor input)") {
    // the reference writes stringify(Event[]) + "\n" to the processor
    // (json-processor.ts:166): jq's `.` is the event ARRAY. Pin with
    // the identity program (whose output IS the processor input), then
    // differentially against the real jq binary for map(.d) — the
    // reference's own send-http example form.
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft-sinkjq")
    def yaml(path: java.nio.file.Path, expr: String) =
      s"""name: p
         |window-key: global
         |steps:
         |  tap:
         |    window:
         |      events: 4
         |    reduce:
         |      send-file:
         |        path: "$path"
         |        jq-expr: '$expr'
         |""".stripMargin
    val input = events((1 to 10).map(i => "ev" -> i.toString): _*)
    val f1 = base.resolve("ident.ndjson")
    val f2 = base.resolve("mapd.ndjson")
    BatchRunner.run(run(yaml(f1, "."), input))
    BatchRunner.run(run(yaml(f2, "map(.d)"), input))
    val ident = java.nio.file.Files.readAllLines(f1).asScala.toList
    val mapd = java.nio.file.Files.readAllLines(f2).asScala.toList
    // 10 events in 4-event windows = 3 vectors (4, 4, 2), each ONE line
    assert(ident.size == 3, ident.mkString("\n"))
    assert(ident.forall(l => l.startsWith("[{\"n\":") && l.endsWith("}]")))
    // our jq tap == the real binary over the same processor input
    val viaBinary = graft.io.JqPipe.pipePartition(ident.iterator, "map(.d)", None).toList
    assert(mapd == viaBinary, s"$mapd != $viaBinary")
    assert(mapd.head == "[1,2,3,4]" && mapd.last == "[9,10]")
    // the COMPILED sink tier (r16 widening): byte-identical bodies,
    // zero subprocesses on the sink path
    val f3 = base.resolve("mapd_compiled.ndjson")
    BatchRunner.run(run("jq-tier: compiled\n" + yaml(f3, "map(.d)"), input))
    assert(java.nio.file.Files.readAllLines(f3).asScala.toList == mapd)
  }

  test("rename + match/drop route only matching events") {
    val out = run(
      """name: p
        |steps:
        |  classify:
        |    match/drop: "metric.#"
        |    flatmap:
        |      rename:
        |        prepend: "seen."
        |""".stripMargin,
      events("metric.a" -> "1", "other.b" -> "2", "metric.c" -> "3"))
    val names = out.output.orderBy("__seq").select("n").collect().map(_.getString(0))
    assert(names.toSeq == Seq("seen.metric.a", "seen.metric.c"))
  }

  test("match/pass forwards non-matching events unmodified") {
    val out = run(
      """name: p
        |steps:
        |  classify:
        |    match/pass: "metric.#"
        |    flatmap:
        |      rename:
        |        replace: "got-metric"
        |""".stripMargin,
      events("metric.a" -> "1", "other.b" -> "2"))
    val names = out.output.orderBy("__seq").select("n").collect().map(_.getString(0)).toSet
    assert(names == Set("got-metric", "other.b"))
  }

  test("reduce window dedup: goldens from reference dedup suite") {
    // data sequence 3.14, 3.14, 3.141, 3.14, 3.14, 3.141, 3.14, 3.1415
    // in one big window => survivors 3.14, 3.141, 3.1415
    val ds = Seq("3.14", "3.14", "3.141", "3.14", "3.14", "3.141", "3.14", "3.1415")
    val out = run(
      """name: p
        |steps:
        |  dd:
        |    window:
        |      events: 100
        |    reduce:
        |      deduplicate: null
        |""".stripMargin,
      events(ds.map(d => "x" -> d): _*))
    val got = out.output.orderBy("__seq").select("d").collect().map(_.getString(0))
    assert(got.toSeq == Seq("3.14", "3.141", "3.1415"))
  }

  test("keep last-2 within count windows") {
    val out = run(
      """name: p
        |steps:
        |  k:
        |    window:
        |      events: 3
        |    reduce:
        |      keep:
        |        last: 2
        |""".stripMargin,
      events((1 to 7).map(i => "x" -> i.toString): _*))
    val got = out.output.orderBy("__seq").select("d").collect().map(_.getString(0))
    // windows (1,2,3)(4,5,6)(7) => keep last 2: 2,3, 5,6, 7
    assert(got.toSeq == Seq("2", "3", "5", "6", "7"))
  }

  test("flatmap sliding windows through jq: README golden (A..E, size 3)") {
    val out = run(
      """name: p
        |steps:
        |  slide:
        |    window:
        |      events: 3
        |    flatmap:
        |      send-receive-jq: '{n: "v", d: (map(.d) | add)}'
        |""".stripMargin,
      events(Seq("A", "B", "C", "D", "E").map(x => "x" -> s""""$x""""): _*))
    val got = out.output.select("d").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("\"ABC\"", "\"BCD\"", "\"CDE\"", "\"DE\"", "\"E\"").sorted)
  }

  test("send-receive-jq aggregates vectors and stamps traces; jq-prelude applies") {
    val out = run(
      """name: p
        |jq-prelude: 'def double: . * 2;'
        |steps:
        |  agg:
        |    window:
        |      events: 2
        |    reduce:
        |      send-receive-jq: '{n: "agg", d: (map(.d) | add | double)}'
        |""".stripMargin,
      events("x" -> "1", "x" -> "2", "x" -> "10", "x" -> "20", "x" -> "5"))
    val got = out.output.select("d").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("6", "60", "10").sorted)
    val traces = out.output.select(size(col("t"))).collect().map(_.getInt(0))
    assert(traces.forall(_ == 1))
  }

  test("send-stdout is a pass-through tap with an NDJSON sink view") {
    val out = run(
      """name: p
        |steps:
        |  tap:
        |    flatmap:
        |      send-stdout: null
        |  next:
        |    after: [tap]
        |    flatmap:
        |      rename:
        |        append: ".done"
        |""".stripMargin,
      events("a" -> "1", "b" -> "2"))
    assert(out.sinks.contains("tap"))
    assert(out.sinks("tap").count() == 2)
    val sample = out.sinks("tap").head().getString(0)
    assert(sample.startsWith("{\"n\":"))
    val names = out.output.select("n").collect().map(_.getString(0)).toSet
    assert(names == Set("a.done", "b.done"))
  }

  test("multi-parent step unions upstreams; terminal steps union to output") {
    val out = run(
      """name: p
        |steps:
        |  evens:
        |    match/drop: "even.#"
        |    flatmap:
        |      rename:
        |        replace: "num"
        |  odds:
        |    match/drop: "odd.#"
        |    flatmap:
        |      rename:
        |        replace: "num"
        |  merge:
        |    after: [evens, odds]
        |    window:
        |      events: 10
        |    reduce:
        |      send-receive-jq: '{n: "count", d: length}'
        |""".stripMargin,
      events("even.2" -> "2", "odd.1" -> "1", "even.4" -> "4", "ignored" -> "0"))
    val got = out.output.select("d").collect().map(_.getString(0))
    assert(got.toSeq == Seq("3"))
  }

  test("send-file distributed mode writes a part-file directory via df.write") {
    val dir = java.nio.file.Files.createTempDirectory("sf-dist").toString + "/out"
    val out = run(
      s"""name: p
         |steps:
         |  dump:
         |    flatmap:
         |      send-file:
         |        path: "$dir"
         |        mode: distributed
         |""".stripMargin,
      events("a" -> "1", "b" -> "2", "c" -> "3"))
    BatchRunner.run(out)
    val back = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(back.length == 3)
    assert(back.forall(_.startsWith("{\"n\":")))
    // part files, not a single driver-written file
    assert(new java.io.File(dir).isDirectory)
  }

  test("spec validation rejects the reference's rejection fixtures") {
    def bad(yaml: String): Unit =
      assertThrows[IllegalArgumentException](Spec.parseYaml(yaml))
    // cycle
    bad("""name: p
          |steps:
          |  foo: {after: [baz], flatmap: {send-stdout: null}}
          |  bar: {after: [foo], flatmap: {send-stdout: null}}
          |  baz: {after: [bar], flatmap: {send-stdout: null}}
          |""".stripMargin)
    // both match modes
    bad("""name: p
          |steps:
          |  s:
          |    match/drop: "a"
          |    match/pass: "b"
          |    flatmap: {send-stdout: null}
          |""".stripMargin)
    // both flatmap and reduce
    bad("""name: p
          |steps:
          |  s:
          |    flatmap: {send-stdout: null}
          |    reduce: {send-stdout: null}
          |""".stripMargin)
    // dangling after
    bad("""name: p
          |steps:
          |  s: {after: [nope], flatmap: {send-stdout: null}}
          |""".stripMargin)
    // reserved name
    bad("""name: p
          |steps:
          |  $input: {flatmap: {send-stdout: null}}
          |""".stripMargin)
    // bad rename affix
    bad("""name: p
          |steps:
          |  s:
          |    flatmap:
          |      rename:
          |        prepend: ".bad"
          |""".stripMargin)
    // rename replace AND affixes
    bad("""name: p
          |steps:
          |  s:
          |    flatmap:
          |      rename:
          |        replace: "x"
          |        append: ".y"
          |""".stripMargin)
  }

  test("send-receive-jsonnet outside the compiled subset is gated on a helper binary") {
    val e = intercept[IllegalArgumentException](Spec.parseYaml(
      """name: p
        |steps:
        |  j:
        |    flatmap:
        |      send-receive-jsonnet: 'function(events) std.foldl(function(a, b) a, events, null)'
        |""".stripMargin))
    assert(e.getMessage.contains("GRAFT_JSONNET_BIN"))
  }

  test("in-subset send-receive-jsonnet runs natively without the helper binary") {
    assert(sys.env.get("GRAFT_JSONNET_BIN").isEmpty) // precondition: no helper offline
    val out = run(
      """name: p
        |window-key: global
        |steps:
        |  agg:
        |    window:
        |      events: 2
        |    reduce:
        |      send-receive-jsonnet: 'function(events) {n: "agg", d: {cnt: std.length(events), hd: events[0].d, lbl: "x-" + std.toString(events[0].n)}}'
        |""".stripMargin,
      events("a" -> "1", "b" -> "2", "c" -> "10"))
    val got = out.output.select("n", "d").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._2)
    assert(got.forall(_._1 == "agg"))
    val ds = got.map(_._2)
    assert(ds.exists(d => d.contains("\"cnt\":2") && d.contains("\"hd\":1") &&
      d.contains("\"lbl\":\"x-a\"")))
    assert(ds.exists(d => d.contains("\"cnt\":1") && d.contains("\"hd\":10") &&
      d.contains("\"lbl\":\"x-c\"")))
    // identity form passes events through unchanged
    val idOut = run(
      """name: p2
        |steps:
        |  id:
        |    flatmap:
        |      send-receive-jsonnet: 'function(events) events'
        |""".stripMargin,
      events("a" -> "1", "b" -> "2"))
    assert(idOut.output.select("n").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
  }

  test("jsonnet std.foldl moving aggregates compile natively (arrival-ordered fold, null raises)") {
    assert(sys.env.get("GRAFT_JSONNET_BIN").isEmpty) // precondition: no helper offline
    val out = run(
      """name: p
        |window-key: global
        |steps:
        |  agg:
        |    window:
        |      events: 3
        |    reduce:
        |      send-receive-jsonnet: 'function(events) {n: "agg", d: {s: std.foldl(function(acc, e) acc + e.d, events, 0), p: std.foldl(function(acc, e) acc * e.d, events, 1), c: std.length(events)}}'
        |""".stripMargin,
      events("a" -> "1", "b" -> "2", "c" -> "10"))
    val ds = out.output.select("d").collect().map(_.getString(0))
    assert(ds.length == 1 && ds.head.contains("\"s\":13.0") &&
      ds.head.contains("\"p\":20.0") && ds.head.contains("\"c\":3"), ds.toSeq)
    // an acc-only body (no per-event operand shape) stays gated
    val e = intercept[IllegalArgumentException](Spec.parseYaml(
      """name: p
        |steps:
        |  j:
        |    flatmap:
        |      send-receive-jsonnet: 'function(events) std.foldl(function(a, b) a, events, null)'
        |""".stripMargin))
    assert(e.getMessage.contains("GRAFT_JSONNET_BIN"))
  }

  test("jsonnet widenings compile natively: locals, prelude functions, std.join/map, std.format, last-trace idiom") {
    assert(sys.env.get("GRAFT_JSONNET_BIN").isEmpty) // precondition: no helper offline
    // prelude `local` function + value local + std.format + std.length
    val out = run(
      """name: p
        |window-key: global
        |jsonnet-prelude: 'local lbl(e) = "id-" + std.toString(e.d);'
        |steps:
        |  agg:
        |    window:
        |      events: 3
        |    reduce:
        |      send-receive-jsonnet: 'function(events) local base = 10; {n: "agg", d: {x: lbl(events[0]), m: std.format("c=%d s=%s!", [std.length(events), events[0].n]), v: base * 2, w: std.length(events[0].n)}}'
        |""".stripMargin,
      events("alpha" -> "1", "b" -> "2", "c" -> "10"))
    val d = out.output.select("d").collect().map(_.getString(0))
    assert(d.length == 1, d.toSeq)
    assert(d.head.contains("\"x\":\"id-1\""), d.head)
    assert(d.head.contains("\"m\":\"c=3 s=alpha!\""), d.head)
    assert(d.head.contains("\"v\":20"), d.head)
    assert(d.head.contains("\"w\":5"), d.head)
    // std.join over std.map in arrival order + the last-trace-entry
    // idiom (the exposition example's shape)
    val out2 = run(
      """name: p2
        |window-key: global
        |steps:
        |  agg:
        |    window:
        |      events: 3
        |    reduce:
        |      send-receive-jsonnet: 'function(events) {n: "agg", d: {names: std.join("|", std.map(function(e) e.n + "=" + std.toString(e.d), events)), pipe: events[0].t[std.length(events[0].t) - 1].p}}'
        |""".stripMargin,
      events("a" -> "1", "b" -> "2", "c" -> "10"))
    val d2 = out2.output.select("d").collect().map(_.getString(0))
    assert(d2.length == 1, d2.toSeq)
    assert(d2.head.contains("\"names\":\"a=1|b=2|c=10\""), d2.head)
    assert(d2.head.contains("\"pipe\":\"p2\""), d2.head)
  }

  test("jsonnet conditionals compile natively: if/then/else, comparisons, && || !") {
    assert(sys.env.get("GRAFT_JSONNET_BIN").isEmpty) // precondition: no helper offline
    val out = run(
      """name: p
        |window-key: global
        |steps:
        |  agg:
        |    window:
        |      events: 3
        |    reduce:
        |      send-receive-jsonnet: 'function(events) {n: "agg", d: {cls: if std.length(events) > 2 then "big" else "small", neg: !(std.length(events) == 2), band: if std.length(events) >= 1 && std.length(events) < 3 then 1 else 0, who: if events[0].n == "a" then "first" else events[0].n}}'
        |""".stripMargin,
      events("a" -> "1", "b" -> "2", "c" -> "10"))
    val d = out.output.select("d").collect().map(_.getString(0))
    assert(d.length == 1, d.toSeq)
    assert(d.head.contains("\"cls\":\"big\""), d.head)
    assert(d.head.contains("\"neg\":true"), d.head)
    assert(d.head.contains("\"band\":0.0"), d.head)
    assert(d.head.contains("\"who\":\"first\""), d.head)
    // per-event conditional inside std.map (the evalEvent tier)
    val out2 = run(
      """name: p2
        |window-key: global
        |steps:
        |  agg:
        |    window:
        |      events: 3
        |    reduce:
        |      send-receive-jsonnet: 'function(events) {n: "agg", d: {tags: std.join("|", std.map(function(e) if e.n == "a" then "A" else e.n, events))}}'
        |""".stripMargin,
      events("a" -> "1", "b" -> "2", "c" -> "10"))
    val d2 = out2.output.select("d").collect().map(_.getString(0))
    assert(d2.length == 1, d2.toSeq)
    assert(d2.head.contains("\"tags\":\"A|b|c\""), d2.head)
  }

  test("variant payload tier: identical output to the string tier, plan reads the __dv variant column") {
    val yaml =
      """name: p
        |window-key: global
        |steps:
        |  sel:
        |    flatmap:
        |      send-receive-jq: '.[] | select(.d.k > 1) | {n: "out", d: {v: (.d.k * 2)}}'
        |  agg:
        |    after: [sel]
        |    window:
        |      events: 2
        |    reduce:
        |      send-receive-jq: '{n: "agg", d: {s: (map(.d.v) | add), c: length}}'
        |""".stripMargin
    val payloads = Seq("a" -> """{"k": 1}""", "b" -> """{"k": 2}""", "c" -> """{"k": 5}""")
    val strOut = run("jq-tier: compiled\n" + yaml, events(payloads: _*))
    val varOut = run("payload-tier: variant\njq-tier: compiled\n" + yaml,
      events(payloads: _*))
    def rows(c: graft.pipeline.BatchCompiler.Compiled) =
      c.output.select("n", "d").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows(strOut) == rows(varOut))
    assert(rows(varOut).nonEmpty)
    // the variant plan really reads the pre-parsed column: __dv appears
    // in the analyzed plan, and the step's field accesses resolve
    // against it (variant_get over __dv, not a fresh parse_json(d))
    val plan = varOut.output.queryExecution.analyzed.toString
    assert(plan.contains("__dv"), plan.take(600))
    assert(!strOut.output.queryExecution.analyzed.toString.contains("__dv"))
  }

  test("jsonnet-prelude parses and rides the template (subprocess tier concatenates it)") {
    val tpl = Spec.parseYaml(
      """name: p
        |jsonnet-prelude: 'local twice(x) = x * 2;'
        |steps:
        |  id:
        |    flatmap:
        |      send-receive-jsonnet: 'function(events) events'
        |""".stripMargin)
    assert(tpl.jsonnetPrelude.contains("local twice(x) = x * 2;"))
  }

  test("envsubst substitutes placeholders like the reference CLI") {
    val y = Spec.envsubst("name: ${GRAFT_TEST_NAME}\n", Map("GRAFT_TEST_NAME" -> "pipe"))
    assert(y == "name: pipe\n")
    assert(Spec.envsubst("x: ${MISSING_VAR_XYZ}!", Map.empty) == "x: !")
  }
}
