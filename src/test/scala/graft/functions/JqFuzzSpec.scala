package graft.functions

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz: random expressions drawn from the compiled jq
  * subset grammar, evaluated by BOTH tiers — the real `jq` 1.6 binary
  * and the compiled Column tier — on random event vectors, asserted
  * equal after numeric canonicalization (jq renders `24` where the
  * compiled tier renders `24.0`; values are compared parsed).
  *
  * Generator constraints mirror the subset's documented semantics:
  * `%`/`fmod` operands are integer-valued (jq's `%` truncates to
  * integers; on integral values C fmod agrees), divisors are nonzero,
  * and generated payload fields are always present (jq's total order
  * ranks null below every number, which the Column tier — three-valued
  * SQL null — does not reproduce; absent-field comparisons fall to the
  * subprocess tier by construction of real pipelines' schemas).
  */
class JqFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // ---- deterministic sampling (no scalatest-scalacheck bridge in the
  // offline cache; same driver shape as PatternSpec). Seed fixed for
  // CI determinism; GRAFT_FUZZ_SEED overrides for exploratory sweeps.
  private val fuzzSeed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(4242L)
  private def samples[A](ga: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(fuzzSeed)
    (1 to n).map { _ =>
      val a = ga.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  // ---- canonicalization ----
  private val mapper = new ObjectMapper()

  private def canon(node: JsonNode): Any =
    if (node == null || node.isNull) null
    else if (node.isNumber) node.asDouble()
    else if (node.isTextual) node.asText()
    else if (node.isBoolean) node.asBoolean()
    else if (node.isArray) {
      (0 until node.size()).map(i => canon(node.get(i))).toList
    } else {
      val it = node.fields()
      val b = scala.collection.mutable.Map.empty[String, Any]
      while (it.hasNext) { val e = it.next(); b(e.getKey) = canon(e.getValue) }
      b.toMap
    }

  private def canonLine(s: String): Any = canon(mapper.readTree(s))

  /** Structural equality with relative tolerance on doubles. Needed only
    * where aggregation re-associates FP addition: Spark's `sum` adds in
    * partition order, jq in arrival order, and (a+b)+c ≠ a+(b+c) at the
    * last ulp. Everything non-numeric stays exact.
    */
  private def approxEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) =>
      x == y || math.abs(x - y) <= 1e-9 * math.max(math.abs(x), math.abs(y))
    case (x: List[_], y: List[_]) =>
      x.size == y.size && x.zip(y).forall { case (u, v) => approxEq(u, v) }
    case (x: Map[_, _], y: Map[_, _]) =>
      val (xm, ym) = (x.asInstanceOf[Map[String, Any]], y.asInstanceOf[Map[String, Any]])
      xm.keySet == ym.keySet && xm.forall { case (k, v) => approxEq(v, ym(k)) }
    case _ => a == b
  }

  // ---- jq oracle ----
  private def jqEval(expr: String, inputJson: String): Seq[String] = {
    val pb = new ProcessBuilder("jq", "-cM", expr)
    val proc = pb.start()
    val out = proc.getOutputStream
    out.write(inputJson.getBytes(StandardCharsets.UTF_8)); out.close()
    val stdout = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val stderr = new String(proc.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
    val code = proc.waitFor()
    assert(code == 0, s"jq failed (exit $code) on '$expr': $stderr")
    stdout.linesIterator.filter(_.nonEmpty).toSeq
  }

  // ---- generators ----
  private val nameGen = Gen.oneOf("a.b", "a.c", "skip.me", "x.y")
  private val intGen = Gen.choose(-50, 50)
  private val dblGen = Gen.choose(-500, 500).map(_ / 10.0)
  private val strGen = Gen.oneOf("alpha", "beta", "gamma", "d7")

  /** Payload: every referenced field always present (see class doc).
    * `ns` is a NUMERIC STRING — the tonumber target (jq raises on
    * non-numeric strings; the compiled tier raises too — loudly, via
    * raise_error — so the generator only produces parseable ones,
    * mirroring real pipelines).
    */
  private val payloadGen: Gen[String] = for {
    k <- intGen; m <- dblGen; x <- intGen; s <- strGen; ns <- intGen
    // falsy-capable fields for the `//` arms: mb/ms sometimes null or
    // absent, fl a real boolean (false IS falsy in jq)
    mb <- Gen.frequency(3 -> intGen.map(_.toString), 1 -> Gen.const("null"),
      1 -> Gen.const(None.toString))
    ms <- Gen.frequency(3 -> strGen.map("\"" + _ + "\""), 1 -> Gen.const("null"),
      1 -> Gen.const(None.toString))
    fl <- Gen.oneOf("true", "false", "null")
  } yield {
    val opt = Seq("mb" -> mb, "ms" -> ms).collect {
      case (f, v) if v != None.toString => s""","$f":$v"""
    }.mkString
    s"""{"k":$k,"m":$m,"s":"$s","o":{"x":$x},"ns":"$ns","fl":$fl$opt}"""
  }

  private val eventGen: Gen[(String, String)] =
    for { n <- nameGen; d <- payloadGen } yield (n, d)
  private val vectorGen: Gen[List[(String, String)]] =
    Gen.choose(1, 6).flatMap(sz => Gen.listOfN(sz, eventGen))

  private val intPaths = Seq(".d.k", ".d.o.x")
  private val numPaths = Seq(".d.k", ".d.m", ".d.o.x")

  private val arithGen: Gen[String] = for {
    p <- Gen.frequency(4 -> Gen.oneOf(numPaths),
      1 -> Gen.zip(intGen, intGen).map { case (d, _) => s"(.d.mb // $d)" })
    op <- Gen.oneOf("+", "-", "*", "/")
    l <- intGen.map(v => if (v == 0) 7 else v)
    nested <- Gen.frequency(3 -> Gen.const(""), 1 -> (for {
      op2 <- Gen.oneOf("+", "-", "*")
      l2 <- intGen
    } yield s" $op2 $l2"))
  } yield s"(($p $op $l)$nested)"

  private val modGen: Gen[String] = for {
    p <- Gen.oneOf(intPaths)
    l <- Gen.choose(1, 9)
    asFmod <- Gen.oneOf(true, false)
  } yield if (asFmod) s"fmod($p; $l)" else s"($p % $l)"

  private val valueGen: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf(numPaths ++ Seq(".d.s", ".d.o", ".n")),
    3 -> arithGen,
    1 -> modGen,
    1 -> Gen.oneOf("(.d.ns | tonumber)", "(.d.k | tostring)",
      "(.d.m | tostring)", "(.d.s | tostring)"),
    1 -> Gen.oneOf(
      "(.d.s | ascii_upcase)", "(.n | ascii_downcase)",
      """(.d.s | ltrimstr("al"))""", """(.d.s | rtrimstr("a"))""",
      """(.n | ltrimstr("a.") | ascii_upcase)""",
      "(.d.m | floor)", "(.d.k | ceil)", "(.d.m | fabs)",
      "(.d.k | fabs | sqrt)", "(.d.m | fabs | sqrt | floor)"))

  private val cmpGen: Gen[String] = Gen.frequency(
    4 -> (for {
      p <- Gen.oneOf(numPaths)
      op <- Gen.oneOf(">", ">=", "<", "<=", "==", "!=")
      l <- intGen
    } yield s"$p $op $l"),
    2 -> (for {
      a <- arithGen
      op <- Gen.oneOf(">", "<", "==")
      l <- intGen
    } yield s"$a $op $l"),
    1 -> (for { op <- Gen.oneOf("==", "!="); s <- nameGen } yield s""".n $op "$s""""),
    1 -> (for { op <- Gen.oneOf("==", "!="); s <- strGen } yield s""".d.s $op "$s""""),
    1 -> (for {
      op <- Gen.oneOf(">", "<", "==", "!=")
      l <- intGen
    } yield s"(.d.ns | tonumber) $op $l"),
    1 -> (for {
      d <- intGen; op <- Gen.oneOf(">", "<", ">=", "<=", "==")
      l <- intGen
    } yield s"(.d.mb // $d) $op $l"))

  /** Flat and/or chains (1-3 atoms) — probes the parser's precedence
    * against jq's (`and` binds tighter than `or`).
    */
  private val condGen: Gen[String] = Gen.frequency(
    3 -> cmpGen,
    2 -> (for { a <- cmpGen; o <- Gen.oneOf("and", "or"); b <- cmpGen } yield s"$a $o $b"),
    1 -> (for {
      a <- cmpGen; o1 <- Gen.oneOf("and", "or")
      b <- cmpGen; o2 <- Gen.oneOf("and", "or")
      c <- cmpGen
    } yield s"$a $o1 $b $o2 $c"))

  /** Value-form conditionals: kind-aligned branches (numeric via
    * arithmetic/literals, string via tostring/literals) under a
    * compilable boolean condition.
    */
  private val ifValGen: Gen[String] = Gen.frequency(
    2 -> (for { c <- condGen; a <- arithGen; l <- intGen }
      yield s"(if $c then $a else $l end)"),
    // r16 widening: DYNAMICALLY-typed branches (bare path vs literal,
    // mixed kinds) ride the variant envelope
    2 -> (for {
      c <- condGen
      p <- Gen.oneOf(".d.k", ".d.m", ".d.s", ".d.o", ".d.o.x")
      l <- Gen.frequency(2 -> intGen.map(_.toString),
        1 -> strGen.map(s => s""""$s""""))
      flip <- Gen.oneOf(true, false)
    } yield
      if (flip) s"(if $c then $l else $p end)"
      else s"(if $c then $p else $l end)"),
    2 -> (for { c <- condGen; p <- Gen.oneOf(".d.k", ".d.s"); q <- Gen.oneOf(".d.m", ".d.o") }
      yield s"(if $c then $p else $q end)"),
    1 -> (for { c <- condGen; a <- strGen; b <- Gen.oneOf("(.d.s | tostring)", "(.n | tostring)") }
      yield s"""(if $c then "$a" else $b end)"""),
    1 -> (for { c <- condGen; c2 <- condGen; a <- intGen; b <- arithGen; l <- dblGen }
      yield s"(if $c then (if $c2 then $a else $b end) else $l end)"))

  /** `path // literal` alternatives over the sometimes-null/absent/
    * false payload fields.
    */
  private val altGen: Gen[String] = Gen.frequency(
    2 -> (for { d <- intGen } yield s"(.d.mb // $d)"),
    2 -> (for { d <- strGen } yield s"""(.d.ms // "$d")"""),
    1 -> (for { d <- Gen.oneOf(true, false) } yield s"(.d.fl // $d)"),
    1 -> (for { d <- dblGen } yield s"(.d.mb // $d)"))

  private val perEventGen: Gen[String] = for {
    nSel <- Gen.choose(0, 2)
    conds <- Gen.listOfN(nSel, condGen)
    a <- valueGen; b <- valueGen
  } yield (Seq(".[]") ++ conds.map(c => s"select($c)") ++
    Seq(s"""{n: "out", d: {a: $a, b: $b}}""")).mkString(" | ")

  private val perVectorGen: Gen[String] = for {
    p <- Gen.oneOf(numPaths)
    p2 <- Gen.oneOf(numPaths)
  } yield s"""{n: "agg", d: {s: (map($p) | add), c: length, f: .[0]$p2}}"""

  /** `group_by | map` count-by / sum-by programs: string key (`.d.s`
    * or `.n`), group fields drawn from key / length / per-group sums.
    */
  private val groupByGen: Gen[String] = for {
    kp <- Gen.oneOf(".d.s", ".n")
    sp <- Gen.oneOf(numPaths)
    withSum <- Gen.oneOf(true, false)
  } yield {
    val sumField = if (withSum) s", t: (map($sp) | add)" else ""
    s"""{n: "agg", d: (group_by($kp) | map({k: .[0]$kp, c: length$sumField}))}"""
  }

  /** `reduce .[] as $x (init; . op expr)` folds — jq's moving-aggregate
    * idiom. `+` may draw the sometimes-null/absent `.d.mb` (null is
    * the identity for jq `+`); `-`/`*` stick to always-present numeric
    * fields (jq errors on null there, and the oracle asserts exit 0).
    */
  private val reduceGen: Gen[String] = Gen.frequency(
    3 -> (for {
      init <- intGen; p <- Gen.oneOf(numPaths :+ ".d.mb")
    } yield s"""{n: "agg", d: (reduce .[] as $$x ($init; . + $$x$p))}"""),
    2 -> (for {
      init <- intGen; op <- Gen.oneOf("-", "*"); p <- Gen.oneOf(numPaths)
    } yield s"""{n: "agg", d: (reduce .[] as $$x ($init; . $op $$x$p))}"""),
    2 -> (for {
      init <- intGen; p <- Gen.oneOf(numPaths)
    } yield s"""{n: "agg", d: (reduce .[]$p as $$v ($init; . + $$v))}"""),
    1 -> (for {
      init <- intGen; p <- Gen.oneOf(numPaths); a <- intGen; b <- intGen
    } yield s"""{n: "agg", d: (reduce .[] as $$x ($init; . + ($$x$p * $a + $b)))}"""))

  /** Entry-scope conditions for the to_entries filter idiom: key
    * compares (string, any op), value equality against literals of
    * every kind (jq cross-kind `==` is plain false — reproduced by
    * the kind guard), and null tests. Ordering compares on `.value`
    * stay out: the payload mixes kinds and the compiled tier RAISES
    * there by contract (unit-tested separately).
    */
  private val entryCondGen: Gen[String] = {
    val keyNames = Seq("k", "m", "s", "o", "ns", "fl", "mb", "ms", "zz")
    val atom: Gen[String] = Gen.frequency(
      3 -> (for { op <- Gen.oneOf("==", "!="); k <- Gen.oneOf(keyNames) }
        yield s""".key $op "$k""""),
      1 -> (for { op <- Gen.oneOf("<", "<=", ">", ">="); k <- Gen.oneOf(keyNames) }
        yield s""".key $op "$k""""),
      2 -> (for { op <- Gen.oneOf("==", "!=") } yield s".value $op null"),
      2 -> (for { op <- Gen.oneOf("==", "!="); v <- intGen } yield s".value $op $v"),
      1 -> (for { op <- Gen.oneOf("==", "!="); v <- strGen } yield s""".value $op "$v""""),
      1 -> (for { op <- Gen.oneOf("==", "!="); v <- Gen.oneOf(true, false) }
        yield s".value $op $v"))
    Gen.frequency(
      2 -> atom,
      1 -> (for { a <- atom; o <- Gen.oneOf("and", "or"); b <- atom } yield s"$a $o $b"))
  }

  /** to_entries / from_entries / keys programs over the `.d` payload. */
  private val entriesGen: Gen[String] = Gen.frequency(
    3 -> entryCondGen.map(c =>
      s""".[] | {n: .n, d: (.d | to_entries | map(select($c)) | from_entries)}"""),
    // r16 widening: del(.k) desugars to the entries idiom — present,
    // absent (zz), and multi-key deletions
    2 -> (for {
      k <- Gen.oneOf("k", "m", "s", "o", "ns", "fl", "mb", "ms", "zz")
    } yield s""".[] | {n: .n, d: (.d | del(.$k))}"""),
    1 -> (for {
      k1 <- Gen.oneOf("k", "m", "s", "zz")
      k2 <- Gen.oneOf("o", "ns", "fl", "mb")
    } yield s""".[] | {n: .n, d: (.d | del(.$k1, .$k2))}"""),
    1 -> Gen.choose(5, 9).map(n =>
      s""".[] | select((.d | to_entries | length) >= $n) | {n: .n, d: .d}"""),
    1 -> Gen.oneOf(
      """.[] | {n: (.d | keys | join(",")), d: .d}""",
      """.[] | {n: (.d | keys_unsorted | join("-")), d: .d}""",
      """.[] | {n: .n, d: {nk: (.d | to_entries | length), fk: (.d | keys | join("|"))}}""",
      """.[] | {n: .n, d: {ks: (.d | keys)}}"""))

  private val wrappedGen: Gen[String] = for {
    p <- Gen.oneOf(intPaths)
    m <- Gen.choose(2, 5)
    thenEmpty <- Gen.oneOf(true, false)
    sel <- Gen.frequency(2 -> Gen.const(""), 1 -> intGen.map(v => s" | select(. > $v)"))
  } yield {
    val ifStage =
      if (thenEmpty) s"if fmod(.; $m) == 0 then empty else . end"
      else s"if fmod(.; $m) != 0 then . else empty end"
    s".[]$p$sel | $ifStage"
  }

  // ---- evaluation ----
  private def inputJson(events: Seq[(String, String)]): String =
    events.map { case (n, d) => s"""{"n":${mapper.writeValueAsString(n)},"d":$d}""" }
      .mkString("[", ",", "]")

  private def eventsDf(events: Seq[(String, String)]) = {
    import spark.implicits._
    events.toDF("n", "d")
  }

  test("per-event fuzz: compiled tier == jq on 700 random select/object programs") {
    import JqCompiler._
    samples(Gen.zip(perEventGen, vectorGen), 700).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(mine == jqs, s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  test("binding fuzz: `path as $x` substitution == jq on 300 random programs") {
    val bindGen = for {
      bp <- Gen.oneOf(".d.k", ".d.m", ".d.o.x", ".d.o", ".d.s")
      nSelPre <- Gen.choose(0, 1)
      pre <- Gen.listOfN(nSelPre, condGen)
      selVar <- Gen.oneOf(true, false)
      cmp <- Gen.choose(0, 9)
    } yield {
      val vuse = if (bp == ".d.o") "$x.x" else "$x"
      val numeric = bp != ".d.s"
      val sel = if (selVar && numeric) Seq(s"select($vuse >= $cmp)") else Seq.empty
      val out =
        if (numeric) s"""{n: "out", d: {a: ($vuse + 1), b: $vuse}}"""
        else s"""{n: "out", d: {a: $vuse, b: "v=\\($vuse)"}}"""
      (Seq(".[]") ++ pre.map(c => s"select($c)") ++
        Seq(s"$bp as $$x") ++ sel ++ Seq(out)).mkString(" | ")
    }
    import JqCompiler._
    samples(Gen.zip(bindGen, vectorGen), 300).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(approxEq(mine, jqs), s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  test("binding unit: shadowing substitutes the inner binder; re-rooting bodies fall back") {
    import JqCompiler._
    // inner $x shadows the outer — jq takes the inner value
    val shadow = """.[] | .d.k as $x | .d.o.x as $x | {n: "out", d: {a: $x}}"""
    val events = Seq(("e", """{"k": 3, "o": {"x": 9}}"""))
    tryCompile(shadow) match {
      case Some(CompiledPerEvent(pe)) =>
        val got = eventsDf(events).select(pe.outPayloadJson).head().getString(0)
        val jqD = canonLine(jqEval(shadow, inputJson(events)).head)
          .asInstanceOf[Map[String, Any]]("d")
        assert(canonLine(got) == jqD, s"shadowed binding: $got vs $jqD")
      case other => fail(s"shadowed binding did not compile: $other")
    }
    // a body stage that re-roots `.` makes substitution unsound → None
    assert(tryCompile(""".[] | .d.k as $x | .d.o | {n: "out", d: {a: $x}}""").isEmpty)
    // non-path binding values stay subprocess-gated
    assert(tryCompile(""".[] | (.d.k + 1) as $x | {n: "out", d: {a: $x}}""").isEmpty)
  }

  test("conditional/alternative fuzz: if-values and `//` == jq on 400 random programs") {
    val progGen = for {
      nSel <- Gen.choose(0, 1)
      conds <- Gen.listOfN(nSel, condGen)
      a <- Gen.frequency(2 -> ifValGen, 2 -> altGen)
      b <- Gen.frequency(1 -> ifValGen, 1 -> altGen, 1 -> valueGen)
    } yield (Seq(".[]") ++ conds.map(c => s"select($c)") ++
      Seq(s"""{n: "out", d: {a: $a, b: $b}}""")).mkString(" | ")
    import JqCompiler._
    samples(Gen.zip(progGen, vectorGen), 400).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(approxEq(mine, jqs), s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  test("reduce fuzz: compiled folds == jq on 200 random reduce programs") {
    import JqCompiler._
    samples(Gen.zip(reduceGen, vectorGen), 200).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerVector(pv)) = compiled: @unchecked
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val agged = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      val payload = pv.keys match {
        case Seq("d") => col("d").cast("string")
        case keys     => to_json(struct(keys.map(col): _*))
      }
      val row = agged.select(pv.outName.as("n"), payload.as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1, s"jq emitted ${jqs.size} rows for '$expr'")
      // left fold in arrival order both sides — same FP sequence, so
      // approxEq's tolerance only papers over nothing here
      assert(approxEq(mine, jqs.head),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $mine vs ${jqs.head}")
    }
  }

  test("entries fuzz: to_entries/from_entries/keys == jq on 250 random programs") {
    import JqCompiler._
    samples(Gen.zip(entriesGen, vectorGen), 250).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(approxEq(mine, jqs), s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  test("entries unit: document order, value-kind guards, and the ordering raise") {
    import JqCompiler._
    // keys_unsorted preserves document order where keys sorts
    val df = eventsDf(Seq(("a.b", """{"zz":1,"aa":2}""")))
    val Some(CompiledPerEvent(pe)) = tryCompile(
      """.[] | {n: (.d | keys_unsorted | join("-")), d: (.d | to_entries | map(.key) | join(","))}""".stripMargin): @unchecked
    val r = df.select(pe.outName, pe.outPayloadJson).head()
    assert(r.getString(0) == "zz-aa")
    assert(r.getString(1) == "\"zz,aa\"")
    val Some(CompiledPerEvent(pe2)) = tryCompile(
      """.[] | {n: (.d | keys | join("-")), d: .d}"""): @unchecked
    assert(df.select(pe2.outName).head().getString(0) == "aa-zz")
    // a homogeneous-numeric object supports value ordering compares
    val dfn = eventsDf(Seq(("a.b", """{"x":1,"y":5,"z":3}""")))
    val Some(CompiledPerEvent(pe3)) = tryCompile(
      """.[] | {n: .n, d: (.d | to_entries | map(select(.value >= 3)) | from_entries)}"""): @unchecked
    assert(dfn.select(pe3.outPayloadJson).head().getString(0) == """{"y":5,"z":3}""")
    // mixed kinds under an ordering compare RAISE (jq totals, we refuse)
    val dfm = eventsDf(Seq(("a.b", """{"x":1,"s":"str"}""")))
    val ex = intercept[Exception] {
      dfm.select(pe3.outPayloadJson).collect()
    }
    assert(ex.getMessage.contains("subprocess tier"), ex.getMessage)
  }

  // scalar-only payload for `with_entries(.value |= tostring)` — an
  // object/array value RAISES on the compiled tier by design (variant
  // rendering would reorder its keys), so the generator stays in the
  // compiled envelope like real pipelines do
  private val scalarPayloadGen: Gen[String] = for {
    k <- intGen; m <- dblGen; s <- strGen; ns <- intGen
    fl <- Gen.oneOf("true", "false", "null")
  } yield s"""{"k":$k,"m":$m,"s":"$s","ns":"$ns","fl":$fl}"""
  private val scalarVectorGen: Gen[List[(String, String)]] =
    Gen.choose(1, 6).flatMap(sz => Gen.listOfN(sz,
      for { n <- nameGen; d <- scalarPayloadGen } yield (n, d)))

  // numbers-or-numeric-strings only, the tonumber domain (jq raises
  // elsewhere, and so does the compiled tier)
  private val numericPayloadGen: Gen[String] = for {
    k <- intGen; m <- dblGen; ns <- intGen; nd <- dblGen
  } yield s"""{"k":$k,"m":$m,"ns":"$ns","nd":"$nd"}"""
  private val numericVectorGen: Gen[List[(String, String)]] =
    Gen.choose(1, 6).flatMap(sz => Gen.listOfN(sz,
      for { n <- nameGen; d <- numericPayloadGen } yield (n, d)))

  /** jq object merge `.d + {…}`: literal and path values, overwrite
    * and append keys, one or two pairs.
    */
  private val mergeGen: Gen[String] = {
    val valGen: Gen[String] = Gen.frequency(
      3 -> intGen.map(_.toString),
      2 -> strGen.map("\"" + _ + "\""),
      1 -> Gen.oneOf("true", "false", "null"),
      2 -> Gen.oneOf(".d.k", ".d.s", ".d.o"))
    for {
      k1 <- Gen.oneOf("k", "s", "fl", "tag", "zz")
      v1 <- valGen
      second <- Gen.option(
        for { k2 <- Gen.oneOf("m", "o", "pp"); v2 <- valGen } yield s", $k2: $v2")
    } yield s""".[] | {n: .n, d: (.d + {$k1: $v1${second.getOrElse("")}})}"""
  }

  test("with_entries/object-merge fuzz: compiled tier == jq on 250 random programs") {
    import JqCompiler._
    val gen: Gen[(String, List[(String, String)])] = Gen.frequency(
      3 -> Gen.zip(Gen.const(
        """.[] | {n: .n, d: (.d | with_entries(.value |= tostring))}"""),
        scalarVectorGen),
      2 -> Gen.zip(Gen.const(
        """.[] | {n: .n, d: (.d | with_entries(.value |= tonumber))}"""),
        numericVectorGen),
      2 -> Gen.zip(entryCondGen.map(c =>
        s""".[] | {n: .n, d: (.d | with_entries(select($c)))}"""), vectorGen),
      4 -> Gen.zip(mergeGen, vectorGen))
    samples(gen, 250).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(approxEq(mine, jqs), s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  test("with_entries/object-merge unit: in-place overwrite, append order, value normalization, loud guards") {
    import JqCompiler._
    // value normalization keeps document order, renders jq-style
    val df = eventsDf(Seq(("a.b", """{"zz":3,"aa":"x","fl":true,"nn":null,"m":4.0}""")))
    val Some(CompiledPerEvent(pe)) = tryCompile(
      """.[] | {n: .n, d: (.d | with_entries(.value |= tostring))}"""): @unchecked
    assert(df.select(pe.outPayloadJson).head().getString(0) ==
      """{"zz":"3","aa":"x","fl":"true","nn":"null","m":"4"}""")
    // merge: existing key overwrites IN PLACE, new keys append in
    // literal order — jq's `+`
    val df2 = eventsDf(Seq(("a.b", """{"b":1,"a":2}""")))
    val Some(CompiledPerEvent(pe2)) = tryCompile(
      """.[] | {n: .n, d: (.d + {a: 9, z: "w"})}"""): @unchecked
    assert(df2.select(pe2.outPayloadJson).head().getString(0) ==
      """{"b":1,"a":9,"z":"w"}""")
    // non-object payload under `+` raises with the subprocess pointer
    val df3 = eventsDf(Seq(("a.b", "5")))
    val ex = intercept[Exception] { df3.select(pe2.outPayloadJson).collect() }
    assert(ex.getMessage.contains("subprocess tier"), ex.getMessage)
    // with_entries tostring on an object value raises (variant
    // rendering would reorder nested keys — loud, never silent)
    val df4 = eventsDf(Seq(("a.b", """{"o":{"x":1}}""")))
    val ex2 = intercept[Exception] { df4.select(pe.outPayloadJson).collect() }
    assert(ex2.getMessage.contains("subprocess tier"), ex2.getMessage)
    // with_entries bodies beyond the compiled envelope stay on the
    // subprocess tier
    assert(tryCompile(
      """.[] | {n: .n, d: (.d | with_entries(.key |= ascii_upcase))}""").isEmpty)
  }

  test("per-vector fuzz: compiled aggregates == jq on 150 random map/add programs") {
    import JqCompiler._
    samples(Gen.zip(perVectorGen, vectorGen), 150).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerVector(pv)) = compiled: @unchecked
      // arrival order is explicit: the ordering column is a required
      // argument of PerVector.aggs, supplied here as a plain row index
      // (BatchCompiler supplies struct(__ts, __seq) in production)
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val agged = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      val payload = pv.keys match {
        case Seq("d") => col("d").cast("string")
        case keys     => to_json(struct(keys.map(col): _*))
      }
      val row = agged.select(pv.outName.as("n"), payload.as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1, s"jq emitted ${jqs.size} rows for '$expr'")
      assert(approxEq(mine, jqs.head),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $mine vs ${jqs.head}")
    }
  }

  test("slice/first/last fuzz: compiled tier == jq on 250 random programs") {
    import JqCompiler._
    // round-16 widenings from the fallback inventory: array slice
    // (map(p) | .[a:b] as the whole d payload), string slice
    // (p[a:b] codepoint-indexed), first/last (.[] | p arrival order)
    val vecSliceGen = for {
      p <- Gen.oneOf(".d.k", ".d.m", ".d.s", ".n")
      a <- Gen.choose(0, 4); w <- Gen.choose(0, 5)
    } yield s"""{n: "agg", d: (map($p) | .[$a:${a + w}])}"""
    val firstLastGen = for {
      p1 <- Gen.oneOf(".d.k", ".d.s", ".d.o.x")
      p2 <- Gen.oneOf(".d.m", ".n", ".d.k")
    } yield s"""{n: "agg", d: {f: first(.[] | $p1), l: last(.[] | $p2), c: length}}"""
    val strSliceGen = for {
      a <- Gen.choose(0, 3); w <- Gen.choose(0, 6)
    } yield s""".[] | {n: .n, d: {a: .d.s[$a:${a + w}], b: (.n[0:2])}}"""
    val vecGen: Gen[(String, List[(String, String)])] = Gen.frequency(
      2 -> Gen.zip(vecSliceGen, vectorGen),
      2 -> Gen.zip(firstLastGen, vectorGen))
    samples(vecGen, 150).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerVector(pv)) = compiled: @unchecked
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val agged = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      val payload = pv.keys match {
        case Seq("d") => col("d").cast("string")
        case keys     => to_json(struct(keys.map(col): _*))
      }
      val row = agged.select(pv.outName.as("n"), payload.as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1, s"jq emitted ${jqs.size} rows for '$expr'")
      assert(approxEq(mine, jqs.head),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $mine vs ${jqs.head}")
    }
    samples(Gen.zip(strSliceGen, vectorGen), 100).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(approxEq(mine, jqs), s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
    // loud guard: a slice on a non-string scalar raises, never silently
    val Some(CompiledPerEvent(pg)) = tryCompile(
      """.[] | {n: .n, d: {a: .d.k[0:2]}}"""): @unchecked
    val dfg = eventsDf(Seq(("a.b", """{"k":7}""")))
    val ex = intercept[Exception] { dfg.select(pg.outPayloadJson).collect() }
    assert(ex.getMessage.contains("subprocess tier"), ex.getMessage)
  }

  test("csv/base64/tojson fuzz: compiled tier == jq on 200 random programs") {
    import JqCompiler._
    // round-16 widenings: map(p) | @csv (vector), p | @base64 and
    // p | tojson (scalar @text/tojson envelopes)
    val csvGen = for {
      p <- Gen.oneOf(".d.k", ".d.m", ".d.s", ".d.ms", ".n")
    } yield s"""{n: "agg", d: (map($p) | @csv)}"""
    val scalGen = for {
      p1 <- Gen.oneOf(".d.k", ".d.m", ".d.s", ".d.fl", ".n")
      p2 <- Gen.oneOf(".d.k", ".d.ns", ".d.s", ".d.fl")
    } yield s""".[] | {n: .n, d: {b: ($p1 | @base64), j: ($p2 | tojson)}}"""
    samples(Gen.zip(csvGen, vectorGen), 100).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerVector(pv)) = compiled: @unchecked
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val agged = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      val row = agged.select(pv.outName.as("n"), col("d").cast("string").as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1 && approxEq(mine, jqs.head),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $mine vs $jqs")
    }
    samples(Gen.zip(scalGen, vectorGen), 100).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(approxEq(mine, jqs), s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
    // loud guards: tojson/@csv on shapes jq renders but the variant
    // would reorder (objects) raise instead of diverging silently
    val Some(CompiledPerEvent(pg)) = tryCompile(
      """.[] | {n: .n, d: {j: (.d.o | tojson)}}"""): @unchecked
    val dfg = eventsDf(Seq(("a.b", """{"o":{"x":1}}""")))
    val ex = intercept[Exception] { dfg.select(pg.outPayloadJson).collect() }
    assert(ex.getMessage.contains("subprocess tier"), ex.getMessage)
    // fromjson round-trips scalar/flat-array JSON text exactly
    val fjGen: Gen[(String, List[(String, String)])] = {
      val jsTextGen: Gen[String] = Gen.oneOf(
        "\"alpha\"", "3", "-4.5", "true", "false", "null", "[1,2,3]",
        "[\"a\",\"b\"]", "[1.5,true,\"x\"]")
      val evGen = for { n <- nameGen; js <- jsTextGen; k <- intGen }
        yield (n, s"""{"k":$k,"js":${mapper.writeValueAsString(js)}}""")
      Gen.zip(
        Gen.const(""".[] | {n: .n, d: {v: (.d.js | fromjson), k: .d.k}}"""),
        Gen.choose(1, 5).flatMap(sz => Gen.listOfN(sz, evGen)))
    }
    samples(fjGen, 60).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = df.select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(approxEq(mine, jqs), s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
    // fromjson yielding an object raises (variant key reordering)
    val Some(CompiledPerEvent(pf)) = tryCompile(
      """.[] | {n: .n, d: {v: (.d.js | fromjson)}}"""): @unchecked
    val dfo = eventsDf(Seq(("a.b", """{"js":"{\"b\":1,\"a\":2}"}""")))
    val exf = intercept[Exception] { dfo.select(pf.outPayloadJson).collect() }
    assert(exf.getMessage.contains("subprocess tier"), exf.getMessage)
    // whole-`.d` tojson/@base64 REFUSE to compile (object-certain
    // payloads: compiling would turn a working subprocess fallback
    // into a guaranteed runtime raise)
    assert(tryCompile(""".[] | {n: .n, d: {j: (.d | tojson)}}""").isEmpty)
    assert(tryCompile(""".[] | {n: .n, d: {b: (.d | @base64)}}""").isEmpty)
    val Some(CompiledPerVector(pvg)) = tryCompile(
      """{n: "agg", d: (map(.d.fl) | @csv)}"""): @unchecked
    val dfb = eventsDf(Seq(("a.b", """{"fl":true}""")))
      .withColumn("__ord", monotonically_increasing_id())
    val ag = pvg.aggs(col("__ord")).map { case (k, c) => c.as(k) }
    val ex2 = intercept[Exception] {
      dfb.groupBy().agg(ag.head, ag.tail: _*).collect()
    }
    assert(ex2.getMessage.contains("subprocess tier"), ex2.getMessage)
  }

  test("any/all fuzz: compiled boolean folds == jq on 200 random programs") {
    // round-16 widening from the fallback inventory: `map(<cond>) |
    // any` / `| all` as vector aggregates (bool_or/bool_and with the
    // select()-identical null-is-false element rule)
    val anyAllGen = for { c1 <- condGen; c2 <- condGen } yield
      s"""{n: "agg", d: {x: (map($c1) | any), y: (map($c2) | all), c: length}}"""
    import JqCompiler._
    samples(Gen.zip(anyAllGen, vectorGen), 200).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerVector(pv)) = compiled: @unchecked
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val agged = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      val payload = pv.keys match {
        case Seq("d") => col("d").cast("string")
        case keys     => to_json(struct(keys.map(col): _*))
      }
      val row = agged.select(pv.outName.as("n"), payload.as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1, s"jq emitted ${jqs.size} rows for '$expr'")
      assert(approxEq(mine, jqs.head),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $mine vs ${jqs.head}")
    }
  }

  test("limit fuzz: compiled per-vector output cap == jq on 200 random programs") {
    // round-16 widening: `limit(n; .[] | ...)` — the first n OUTPUTS
    // of the inner stream (each event emits <= 1 output, so that is
    // the outputs of the first n surviving events, in arrival order)
    // n >= 1 only: jq 1.6's limit(0; g) emits ONE output (its
    // documented bug, fixed in 1.7) — limit(0) is refused to the
    // subprocess tier so both tiers show the binary's behavior
    assert(JqCompiler.tryCompile(
      """limit(0; .[] | {n: "out", d: {a: .d.k}})""").isEmpty)
    val limitGen = for {
      n <- Gen.choose(1, 6)
      nSel <- Gen.choose(0, 2)
      conds <- Gen.listOfN(nSel, condGen)
      a <- valueGen
    } yield s"limit($n; " + (Seq(".[]") ++ conds.map(c => s"select($c)") ++
      Seq(s"""{n: "out", d: {a: $a}}""")).mkString(" | ") + ")"
    import JqCompiler._
    samples(Gen.zip(limitGen, vectorGen), 200).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEventLimited(pe, n)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().take(n)
        .map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(mine == jqs, s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  test("sink-map fuzz: compiled map(.d-path) bodies == jq over the same vectors on 150 random programs") {
    // r16 widening of the reference's own send-http example form:
    // one body line per vector = the array of mapped payload values
    val gen = Gen.oneOf("map(.d)", "map(.d.k)", "map(.d.s)", "map(.d.o)",
      "map(.d.mb)", "map(.d.o.x)", "map(.d.ns)")
    samples(Gen.zip(gen, vectorGen), 150).foreach { case (expr, events) =>
      val b = JqCompiler.tryCompileSinkMap(expr)
      assert(b.isDefined, s"generator left the subset: $expr")
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val line = df.groupBy().agg(b.get(col("__ord")).as("line")).head().getString(0)
      val jqs = jqEval(expr, inputJson(events)).toList
      assert(jqs.size == 1, s"jq emitted ${jqs.size} rows for '$expr'")
      assert(approxEq(canonLine(line), canonLine(jqs.head)),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $line vs ${jqs.head}")
    }
  }

  test("group_by fuzz: compiled count-by/sum-by == jq on 150 random programs") {
    import JqCompiler._
    samples(Gen.zip(groupByGen, vectorGen), 150).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerVector(pv)) = compiled: @unchecked
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val agged = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      val payload = pv.keys match {
        case Seq("d") => col("d").cast("string")
        case keys     => to_json(struct(keys.map(col): _*))
      }
      val row = agged.select(pv.outName.as("n"), payload.as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1, s"jq emitted ${jqs.size} rows for '$expr'")
      assert(approxEq(mine, jqs.head),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $mine vs ${jqs.head}")
    }
  }

  /** `sort_by | map` programs: STRING keys only (.d.s / .n — keys
    * compare as strings in the compiled tier, the group_by envelope),
    * element fields drawn from numeric and string paths.
    */
  private val sortByGen: Gen[String] = for {
    kp <- Gen.oneOf(".d.s", ".n")
    p1 <- Gen.oneOf(numPaths)
    p2 <- Gen.oneOf(".n", ".d.s")
  } yield s"""{n: "agg", d: (sort_by($kp) | map({a: $p1, b: $p2}))}"""

  /** `min_by`/`max_by` as object fields (first-minimal / last-maximal
    * element, then a path off it) — string keys, same envelope.
    */
  private val minMaxByGen: Gen[String] = for {
    fn <- Gen.oneOf("min_by", "max_by")
    kp <- Gen.oneOf(".d.s", ".n")
    vp <- Gen.oneOf(numPaths :+ ".n")
  } yield s"""{n: "agg", d: {v: ($fn($kp) | $vp), c: length}}"""

  test("sort_by fuzz: compiled stable sort == jq on 150 random programs") {
    import JqCompiler._
    samples(Gen.zip(sortByGen, vectorGen), 150).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerVector(pv)) = compiled: @unchecked
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val row = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
        .select(pv.outName.as("n"), col("d").cast("string").as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1, s"jq emitted ${jqs.size} rows for '$expr'")
      assert(approxEq(mine, jqs.head),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $mine vs ${jqs.head}")
    }
  }

  test("min_by/max_by fuzz: first-minimal/last-maximal tie rule == jq on 150 random programs") {
    import JqCompiler._
    samples(Gen.zip(minMaxByGen, vectorGen), 150).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerVector(pv)) = compiled: @unchecked
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val row = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
        .select(pv.outName.as("n"), col("d").cast("string").as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1, s"jq emitted ${jqs.size} rows for '$expr'")
      assert(approxEq(mine, jqs.head),
        s"DIVERGENCE on '$expr' with ${inputJson(events)}: $mine vs ${jqs.head}")
    }
  }

  test("sort_by with a missing key field: null-key elements sort first, stably, matching jq") {
    import JqCompiler._
    val expr = """{n: "agg", d: (sort_by(.d.s) | map({nm: .n, k: .d.k}))}"""
    val events = Seq(
      ("a.b", """{"k":3,"m":1.5}"""),
      ("a.b", """{"k":4,"m":0.5,"s":"beta"}"""),
      ("a.c", """{"k":5,"m":2.0}"""),
      ("a.b", """{"k":6,"m":0.0,"s":"alpha"}"""),
      ("a.c", """{"k":7,"m":1.0,"s":"beta"}"""))
    val Some(CompiledPerVector(pv)) = tryCompile(expr): @unchecked
    val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
    val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
    val row = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      .select(pv.outName.as("n"), col("d").cast("string").as("d")).head()
    val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
    val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
    assert(jqs.size == 1)
    assert(approxEq(mine, jqs.head), s"DIVERGENCE: $mine vs ${jqs.head}")
  }

  test("group_by with a missing key field: the null-key group counts and sorts first, matching jq") {
    import JqCompiler._
    val expr = """{n: "agg", d: (group_by(.d.s) | map({k: .[0].d.s, c: length, t: (map(.d.k) | add)}))}"""
    // two events MISSING .d.s (null key — one jq group, sorted ahead of
    // the string keys), plus two "beta" and one "alpha"
    val events = Seq(
      ("a.b", """{"k":3,"m":1.5}"""),
      ("a.b", """{"k":4,"m":0.5,"s":"beta"}"""),
      ("a.c", """{"k":5,"m":2.0}"""),
      ("a.b", """{"k":6,"m":0.0,"s":"alpha"}"""),
      ("a.c", """{"k":7,"m":1.0,"s":"beta"}"""))
    val Some(CompiledPerVector(pv)) = tryCompile(expr): @unchecked
    val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
    val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
    val row = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      .select(pv.outName.as("n"), col("d").cast("string").as("d")).head()
    val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
    val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
    assert(jqs.size == 1)
    assert(approxEq(mine, jqs.head), s"DIVERGENCE: $mine vs ${jqs.head}")
  }

  // ---- round-12 widenings: interpolation, split/join, unique_by ----

  private val interpGen: Gen[String] = for {
    lit1 <- Gen.oneOf("x ", "id=", "", "[")
    p1 <- Gen.oneOf(".d.s", ".n", ".d.k", ".d.m")
    lit2 <- Gen.oneOf(" - ", "/", "")
    p2 <- Gen.oneOf(".d.s", ".d.k", ".d.o.x")
    lit3 <- Gen.oneOf("!", "", " end")
  } yield s"""{n: "out", d: {msg: "$lit1\\($p1)$lit2\\($p2)$lit3"}}"""

  test("string-interpolation fuzz: compiled tier == jq on 200 random programs") {
    import JqCompiler._
    samples(Gen.zip(interpGen, vectorGen), 200).foreach { case (objExpr, events) =>
      val expr = s".[] | $objExpr"
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(mine == jqs, s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  private val splitJoinGen: Gen[String] = for {
    sep <- Gen.oneOf("a", "l", "-", "ph")
    form <- Gen.oneOf(0, 1, 2)
    sep2 <- Gen.oneOf("|", "_", "::")
  } yield form match {
    case 0 => s"""{n: "out", d: {parts: (.d.s | split("$sep"))}}"""
    case 1 => s"""{n: "out", d: {j: (.d.s | split("$sep") | join("$sep2"))}}"""
    case 2 => s"""{n: "out", d: {c: (.d.s | split("$sep") | length)}}"""
  }

  test("split/join fuzz: compiled tier == jq on 200 random programs") {
    import JqCompiler._
    samples(Gen.zip(splitJoinGen, vectorGen), 200).foreach { case (objExpr, events) =>
      val expr = s".[] | $objExpr"
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(mine == jqs, s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  test("unique_by map/length and map|join aggregates == jq, null keys included") {
    import JqCompiler._
    val events = Seq(
      ("a.b", """{"k":3,"s":"beta"}"""),
      ("a.b", """{"k":4}"""),                 // missing s -> null-key group
      ("a.c", """{"k":5,"s":"alpha"}"""),
      ("a.b", """{"k":6,"s":"beta"}"""),      // duplicate key: first wins
      ("a.c", """{"k":7}"""),                 // second null key: not a new group
      ("a.c", """{"k":8,"s":"gamma"}"""))
    val exprs = Seq(
      """{n: "agg", d: (unique_by(.d.s) | map({s: .d.s, k: .d.k}))}""",
      """{n: "agg", d: {u: (unique_by(.d.s) | length), j: (map(.n) | join(","))}}""")
    exprs.foreach { expr =>
      val Some(CompiledPerVector(pv)) = tryCompile(expr): @unchecked
      val df = eventsDf(events).withColumn("__ord", monotonically_increasing_id())
      val aggCols = pv.aggs(col("__ord")).map { case (k, c) => c.as(k) }
      val agged = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
      val payload = pv.keys match {
        case Seq("d") => col("d").cast("string")
        case keys     => to_json(struct(keys.map(col): _*))
      }
      val row = agged.select(pv.outName.as("n"), payload.as("d")).head()
      val mine = Map("n" -> row.getString(0), "d" -> canonLine(row.getString(1)))
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(jqs.size == 1)
      assert(approxEq(mine, jqs.head), s"DIVERGENCE on '$expr': $mine vs ${jqs.head}")
    }
  }

  // ---- round-13 widenings: regex predicates/replacement, array fns ----

  /** Escape a raw regex/string for embedding in a jq string literal. */
  private def jqStr(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Regex pool spanning the compiled dialect: literals, classes,
    * quantifiers (incl. empty-matchable `a*` and the empty pattern),
    * anchors, alternation, groups, escapes.
    */
  private val rePool = Seq(
    "a", "al", "be", "a.b", "a+", "[ab]+", "^al", "a|be", "t?a",
    "a*", "[^a]", "\\w+", "g.mma", "a{2}", "ph", "\\.", "m+a",
    "e(t|l)a", "", "[a-m]+$", "\\d", "[.]b")
  /** gsub pool: jq 1.6's gsub infinite-loops on empty-matchable
    * patterns (the compiled tier refuses them too — see JqCompiler),
    * so the gsub arm draws only from patterns needing ≥1 char.
    */
  private val rePoolNonEmpty = rePool.filterNot(re =>
    java.util.regex.Pattern.compile(re).matcher("").find())
  // "2X" (digit-leading) guards the sub() group-reference fusion fix
  private val replPool = Seq("X", "", "$2", "-", "x$y", "a\\b", "2X")

  private val regexFnGen: Gen[String] = for {
    sp   <- Gen.oneOf(".d.s", ".n")
    re   <- Gen.oneOf(rePool)
    reG  <- Gen.oneOf(rePoolNonEmpty)
    re2  <- Gen.oneOf(rePool)
    repl <- Gen.oneOf(replPool)
    pre  <- Gen.oneOf("al", "a.", "be", "d")
    suf  <- Gen.oneOf("a", "b", "ma", "7")
    reI  <- Gen.oneOf("AL", "Beta", "^AL", "A|BE", "G.MMA", "[A-M]+", "PH", "a{2}")
    form <- Gen.choose(0, 7)
  } yield {
    val (r, rg, r2, rp) = (jqStr(re), jqStr(reG), jqStr(re2), jqStr(repl))
    form match {
      case 0 => s"""{n: "out", d: {a: ($sp | test("$r"))}}"""
      case 1 => s"""{n: "out", d: {a: ($sp | gsub("$rg"; "$rp"))}}"""
      case 2 => s"""{n: "out", d: {a: ($sp | sub("$r"; "$rp"))}}"""
      case 3 => s"""{n: "out", d: {a: ($sp | startswith("$pre")), b: ($sp | endswith("$suf"))}}"""
      case 4 => s"""{n: "out", d: {a: ($sp | test("$r") | not), b: (.d.o | has("x")), c: (.d | has("mb"))}}"""
      case 5 => s"""{n: "out", d: {a: ($sp | gsub("$rg"; "$rp") | ascii_upcase), b: ($sp | sub("$r2"; "$rp"))}}"""
      case 6 => s"""{n: "out", d: {a: (.d.o | has("y")), b: (.d | has("ms"))}}"""
      case 7 => s"""{n: "out", d: {a: ($sp | test("${jqStr(reI)}"; "i")), b: ($sp | test("${jqStr(reI)}"))}}"""
    }
  }

  private val regexSelGen: Gen[String] = for {
    sp   <- Gen.oneOf(".d.s", ".n")
    re   <- Gen.oneOf(rePool)
    pre  <- Gen.oneOf("al", "a.", "be")
    form <- Gen.choose(0, 3)
  } yield form match {
    case 0 => s"""select($sp | test("${jqStr(re)}"))"""
    case 1 => s"""select($sp | startswith("$pre"))"""
    case 2 => s"""select($sp | endswith("a") | not)"""
    case 3 => s"""select(.d | has("ms"))"""
  }

  test("regex/predicate fuzz: test/gsub/sub/startswith/endswith/has/not == jq on 400 random programs") {
    import JqCompiler._
    val progGen = for {
      sel <- Gen.option(regexSelGen)
      obj <- regexFnGen
    } yield (Seq(".[]") ++ sel ++ Seq(obj)).mkString(" | ")
    samples(Gen.zip(progGen, vectorGen), 400).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(mine == jqs, s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  private val arrayFnGen: Gen[String] = for {
    sp   <- Gen.oneOf(".d.s", ".n")
    sep  <- Gen.oneOf("a", "l", "-", "ph", ".", "b")
    sep2 <- Gen.oneOf("|", "_", "")
    form <- Gen.choose(0, 6)
  } yield {
    val s = jqStr(sep)
    form match {
      case 0 => s"""{n: "out", d: {a: ($sp | split("$s") | sort)}}"""
      case 1 => s"""{n: "out", d: {a: ($sp | split("$s") | unique | join("$sep2"))}}"""
      case 2 => s"""{n: "out", d: {a: ($sp | split("$s") | reverse | join("$sep2"))}}"""
      case 3 => s"""{n: "out", d: {a: ($sp | split("$s") | min), b: ($sp | split("$s") | max)}}"""
      case 4 => s"""{n: "out", d: {a: (.n | length), b: (.d.s | ascii_downcase | length)}}"""
      case 5 => s"""{n: "out", d: {a: (.d.m | round), b: (.d.k | round)}}"""
      case 6 => s"""{n: "out", d: {a: ($sp | split("$s") | sort | join("$sep2")), b: ($sp | split("$s") | reverse)}}"""
    }
  }

  test("array-fn/length/round fuzz: sort/unique/reverse/min/max chains == jq on 300 random programs") {
    import JqCompiler._
    val progGen = for {
      cond <- Gen.option(Gen.oneOf(
        """select((.n | length) > 3)""",
        """select((.d.s | ascii_upcase | length) >= 4)""",
        """select((.d.s | gsub("a"; "")) != "lph")"""))
      obj <- arrayFnGen
    } yield (Seq(".[]") ++ cond ++ Seq(obj)).mkString(" | ")
    samples(Gen.zip(progGen, vectorGen), 300).foreach { case (expr, events) =>
      val compiled = tryCompile(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val Some(CompiledPerEvent(pe)) = compiled: @unchecked
      val df = eventsDf(events)
      val mine = pe.filter.fold(df)(df.filter)
        .select(pe.outName, pe.outPayloadJson)
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(mine == jqs, s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  test("wrapped-value fuzz: compiled tier == jq on 150 random sieve programs") {
    import JqCompiler._
    samples(Gen.zip(wrappedGen, vectorGen), 150).foreach { case (expr, events) =>
      val compiled = tryCompileWrapped(expr)
      assert(compiled.isDefined, s"generator left the subset: $expr")
      val pv = compiled.get
      val df = eventsDf(events)
      val mine = pv.filter.fold(df)(df.filter)
        .select(pv.valueJson)
        .collect().map(r => canonLine(r.getString(0))).toList
      val jqs = jqEval(expr, inputJson(events)).map(canonLine).toList
      assert(mine == jqs, s"DIVERGENCE on '$expr' with ${inputJson(events)}")
    }
  }

  // ---- end-to-end arm: through the REAL pipeline assembly ----
  //
  // The per-vector contract bug (first() silently requiring __ts/__seq)
  // hid precisely in the gap between "evaluate the compiled Column" and
  // "run the pipeline BatchCompiler actually assembles". This arm closes
  // that gap: each random program is wrapped in a real YAML template
  // (window + send-receive-jq, compiled tier), run through
  // stampInput → compile → output, and compared against the jq binary
  // applied to the same tumbling count-windows. A prelude variant forces
  // the out-of-subset fallback, so the subprocess tier's vector assembly
  // is differential-tested by the same oracle.

  private sealed trait Prog { def expr: String }
  private case class PerEventP(expr: String) extends Prog
  private case class PerVectorP(expr: String) extends Prog
  private case class WrappedP(expr: String) extends Prog
  private case class PreludeP(expr: String) extends Prog      // `def dbl` → subprocess fallback
  private case class KeyedPreludeP(expr: String) extends Prog // + default window-key: name

  private val preludeDef = "def dbl: . * 2;"
  private val preludeExprGen: Gen[String] = for {
    p <- Gen.oneOf(numPaths)
    c <- Gen.option(cmpGen)
  } yield (Seq(".[]") ++ c.map(x => s"select($x)") ++
    Seq(s"""{n: "out", d: {a: ($p | dbl)}}""")).mkString(" | ")

  private val progGen: Gen[Prog] = Gen.frequency(
    3 -> perEventGen.map(PerEventP),
    3 -> perVectorGen.map(PerVectorP),
    1 -> groupByGen.map(PerVectorP),
    2 -> wrappedGen.map(WrappedP),
    2 -> preludeExprGen.map(PreludeP),
    2 -> preludeExprGen.map(KeyedPreludeP))

  private val e2eCaseGen: Gen[(Prog, Int, List[(String, String)])] = for {
    prog <- progGen
    k <- Gen.choose(1, 5)
    events <- Gen.choose(3, 12).flatMap(sz => Gen.listOfN(sz, eventGen))
  } yield (prog, k, events)

  /** The keyed oracle's window partitioning: per event name (stable
    * arrival order within a name), names iterated in sorted order —
    * matching the subprocess tier's (__wk, vec_id) vector ordering.
    */
  private def keyedWindows(events: Seq[(String, String)], k: Int): Seq[Seq[(String, String)]] =
    events.map(_._1).distinct.sorted.flatMap { name =>
      events.filter(_._1 == name).grouped(k).toSeq
    }

  test("pipeline fuzz: BatchCompiler assembly == jq over tumbling windows on 80 random pipelines") {
    import graft.pipeline.BatchCompiler
    import graft.spec.Spec
    import spark.implicits._
    samples(e2eCaseGen, 80).foreach { case (prog, k, events) =>
      val wrapLine = prog match {
        case WrappedP(_) => "\n        wrap: \"fuzz.wrapped\""
        case _           => ""
      }
      val preludeLine = prog match {
        case PreludeP(_) | KeyedPreludeP(_) => s"\njq-prelude: '$preludeDef'"
        case _                              => ""
      }
      // window-key: global gives the arrival-order tumbling windows the
      // ordered oracle below reproduces; KeyedPreludeP leaves the
      // template on the default (name-keyed) path instead
      val keyLine = prog match {
        case KeyedPreludeP(_) => ""
        case _                => "\nwindow-key: global"
      }
      val yaml =
        s"""name: fuzz
           |jq-tier: compiled$preludeLine$keyLine
           |steps:
           |  s:
           |    window:
           |      events: $k
           |    reduce:
           |      send-receive-jq:
           |        jq-expr: '${prog.expr}'$wrapLine
           |""".stripMargin
      val input = events.zipWithIndex
        .map { case ((n, d), i) => (n, d, i.toLong, i.toDouble) }
        .toDF("n", "d", "__seq", "arrival")
      val tpl = Spec.parseYaml(yaml)
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      val out = BatchCompiler.compile(spark, tpl, stamped).output
      val mine = out.orderBy("__ts", "__seq").select("n", "d")
        .collect().map(r => Map("n" -> r.getString(0), "d" -> canonLine(r.getString(1))))
        .toList
      // oracle: the jq binary over each tumbling count-window, prelude
      // prepended exactly as the subprocess tier does
      val program = prog match {
        case PreludeP(e)      => s"$preludeDef $e"
        case KeyedPreludeP(e) => s"$preludeDef $e"
        case p                => p.expr
      }
      val windows = prog match {
        case KeyedPreludeP(_) => keyedWindows(events, k)
        case _                => events.grouped(k).toSeq
      }
      val jqs = windows.flatMap { window =>
        jqEval(program, inputJson(window)).map(canonLine).map { v =>
          prog match {
            case WrappedP(_) => Map[String, Any]("n" -> "fuzz.wrapped", "d" -> v)
            case _           => v
          }
        }
      }.toList
      assert(approxEq(mine, jqs),
        s"DIVERGENCE on pipeline '${prog.expr}' (window $k, ${prog.getClass.getSimpleName}) " +
          s"with ${inputJson(events)}: $mine vs $jqs")
    }
  }
}
