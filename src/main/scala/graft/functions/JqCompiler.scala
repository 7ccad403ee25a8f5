package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiled tier for jq expressions (SURVEY.md §2.4 #12): the common
  * forms found in reference pipelines lower to native Column
  * expressions — no subprocess, codegen'd, pushdown-eligible — and
  * anything outside the subset falls back to the per-partition `jq`
  * process ([[graft.io.JqPipe]]). `tryCompile` returning None IS the
  * fallback signal.
  *
  * Supported surface (over an event vector, like real jq):
  *   - `.[] | ...` per-event stream: optional `select(<cond>)` stages
  *     and a final path or `{...}` object construction
  *   - vector aggregation: `{k: (map(<path>) | add), k2: length,
  *     k3: .[0]<path>, ...}` — one output object per vector
  *   - paths `.n`, `.d.x.y`, `.t[0].i`; literals; numeric comparisons
  *     and `==`/`!=` on strings; `and`/`or`; arithmetic `+ - * / %`;
  *     `fmod(a; b)`; `<path> | tonumber` (numeric strings) and
  *     `<path> | tostring` (strings/booleans pass through, integral
  *     numbers drop the decimal point, exact below 1e15)
  *   - typed function chains over paths: `split`/`join`,
  *     `ltrimstr`/`rtrimstr`, `ascii_downcase`/`ascii_upcase`,
  *     `floor`/`ceil`/`fabs`/`sqrt`/`round`, `length` of a split,
  *     `reverse`/`sort`/`unique`/`min`/`max` over a split array,
  *     string predicates `startswith`/`endswith`/`test(re)` (+ `not`),
  *     `has(key)` on object payloads, and `gsub`/`sub` regex
  *     replacement (literal replacement text; `test`/`gsub`/`sub`
  *     regexes limited to the Java↔Oniguruma common dialect —
  *     [[safeRegex]]) — a wrong runtime kind raises loudly where jq
  *     raises (never a silent cast); boolean-ended chains work as
  *     `select` conditions and number/string-ended chains as
  *     kind-aligned comparison operands
  *   - value-form `if <cond> then a else b end` (kind-aligned
  *     branches) and `path // literal` alternatives (null, absent,
  *     and false are falsy, like jq; the non-falsy side passes
  *     through untyped)
  *   - pipe-level bindings `<path> as $x | <body>` (the reference's
  *     `.d as $n | "...\($n)..."` idiom) — expanded by substitution
  *     when the body's non-final stages are all `select(...)` (so `$x`
  *     and the inlined path see the same `.`); non-path values,
  *     re-rooting bodies, and any unrecognized shape fall to the
  *     subprocess tier, never a silent wrong value
  *   - vector `group_by(<path>) | map({...})` as the whole `d`
  *     payload: key / `length` / `map(<path>)|add` group fields,
  *     string-compared keys — the count-by / sum-by idiom
  *   - vector `reduce .[] as $x (init; . op expr($x))` folds (ops
  *     `+`/`-`/`*`; `+` with jq's null-is-identity, `-`/`*` raising on
  *     null like jq) — the reference's moving-aggregate idiom; both
  *     `.[]`- and `.[]<path>`-rooted variables
  *   - object-entries forms over the `.d` payload: `to_entries |
  *     map(select(cond)) | from_entries` (the filter-object idiom;
  *     key compares + kind-guarded value equality, document key order
  *     preserved end-to-end), `to_entries | length`, `to_entries |
  *     map(.key)`, `keys` (sorted, any object path) and
  *     `keys_unsorted` (document order, whole-`.d`)
  *   - per-event `{n, d, t: .t}` with the literal trace passthrough
  *     (a traced replacement event keeps its trace, matching the
  *     reference's parse semantics)
  *   - wrapped value streams (`tryCompileWrapped`, for steps with a
  *     `wrap:` directive): `.[]<path> | ...` rebinds `.` to the path's
  *     value, then conditional-drop stages
  *     `if <cond> then empty else . end` (either arm `empty`) and/or
  *     `select(...)`, ending in `.` or an expression over it — the
  *     shape of the reference's stress-test filters
  *     (examples/stress-test/pipeline.yaml:48,59).
  *
  * Numbers follow jq 1.6 semantics (IEEE doubles).
  */
object JqCompiler {

  // ---- AST ----
  sealed trait Ast
  case class Path(segs: Seq[Either[String, Int]]) extends Ast // fields / [idx]
  case class Lit(v: Any) extends Ast
  case class Select(cond: Ast) extends Ast
  case class ObjCons(fields: Seq[(String, Ast)]) extends Ast
  case class Cmp(op: String, l: Ast, r: Ast) extends Ast
  case class Logic(op: String, l: Ast, r: Ast) extends Ast
  case class Arith(op: String, l: Ast, r: Ast) extends Ast
  case class PipeSeq(stages: Seq[Ast]) extends Ast
  case object IterateAll extends Ast
  case object Length extends Ast
  case object Add extends Ast
  /** 0-arity `any` / `all` — jq's boolean fold over an array (here the
    * `map(<cond>) | any` vector-aggregate idiom). */
  case class AnyAll(isAll: Boolean) extends Ast
  /** `limit(n; .[] | ...)` — the first n OUTPUTS of the inner stream,
    * per vector (jq's limit builtin). */
  case class LimitN(n: Int, body: Ast) extends Ast
  case class MapExpr(inner: Ast) extends Ast
  case class First(path: Path) extends Ast // .[0].x.y
  case object Empty extends Ast
  case class IfElse(cond: Ast, thenB: Ast, elseB: Ast) extends Ast
  case object ToString extends Ast
  case object ToNumber extends Ast
  case class GroupByKey(key: Path) extends Ast
  case class UniqueByKey(key: Path) extends Ast
  case class SortByKey(key: Path) extends Ast
  /** `min_by(<key>)` / `max_by(<key>)`; jq picks the FIRST minimal and
    * the LAST maximal element (its sort is stable and min/max take
    * `.[0]`/`.[-1]` — verified against jq 1.6).
    */
  case class MinMaxByKey(key: Path, isMax: Boolean) extends Ast
  case class SplitFn(sep: String) extends Ast
  case class JoinFn(sep: String) extends Ast
  /** `"a\(.d.k)b"` — literal runs (Left) and interpolated exprs (Right). */
  case class StrInterp(parts: Seq[Either[String, Ast]]) extends Ast
  case class Alt(l: Ast, r: Ast) extends Ast // jq `a // b` (null/false fallback)
  /** Unary string/math builtins riding path chains: ltrimstr/rtrimstr
    * (literal arg), ascii_downcase/ascii_upcase, floor/ceil/fabs/sqrt,
    * startswith/endswith/test (string→boolean), not, round,
    * reverse/sort/unique/min/max (array), has (object→boolean). */
  case class Fn1(name: String, arg: Option[String]) extends Ast
  /** Two-literal-arg builtins: `gsub("re"; "repl")` / `sub("re"; "repl")`. */
  case class Fn2(name: String, a: String, b: String) extends Ast
  /** `reduce src as $v (init; update)` */
  case class Reduce(src: Ast, varName: String, init: Ast, upd: Ast) extends Ast
  /** `$name<path>` — a variable reference with an optional trailing path. */
  case class VarPath(name: String, segs: Seq[Either[String, Int]]) extends Ast
  /** `<value> as $name | <body>` — a pipe-level binding; the body is
    * the rest of the pipe. Expanded before compilation by
    * [[expandLet]] (path values only, `.`-preserving bodies only —
    * everything else falls to the subprocess tier).
    */
  case class LetBind(name: String, value: Ast, body: Ast) extends Ast
  case object ToEntries extends Ast
  case object FromEntries extends Ast
  // jq `p |= f` (update-assign); compiled only as with_entries'
  // `.value |= tostring/tonumber` body
  case class UpdatePath(path: Path, body: Ast) extends Ast
  // jq slice `.[from:to]` — non-negative literal bounds only
  case class Slice(from: Int, to: Int) extends Ast
  case object FormatCsv extends Ast    // jq `@csv` over a mapped vector
  case object FormatBase64 extends Ast // jq `@base64` over a string value
  case object ToJson extends Ast       // jq `tojson` — scalar values only
  case object FromJson extends Ast     // jq `fromjson` — object-free values only
  // jq `first(.[] | p)` / `last(.[] | p)` over the step vector
  case class FirstLast(path: Path, isLast: Boolean) extends Ast
  /** jq `keys` (sorted=true) / `keys_unsorted`. */
  case class KeysFn(sorted: Boolean) extends Ast

  // ---- results ----
  /** Per-event compiled form: a row filter plus output event columns. */
  /** `keepTrace`: the program emitted `t: .t` — the event keeps its
    * existing trace (reference src/event.ts:244-263 parse semantics:
    * a replacement event with a trace keeps it; only trace-less
    * output is stamped fresh).
    */
  final case class PerEvent(filter: Option[Column], outName: Column,
                            outPayloadJson: Column, keepTrace: Boolean = false)
  /** Per-vector compiled form: aggregate builders keyed by output field.
    *
    * Order-sensitive aggregates (jq's `.[0].path` = "first event") need a
    * total arrival order; the builder takes it as an explicit argument —
    * a sortable Column (e.g. `struct(col("__ts"), col("__seq"))`) whose
    * underlying columns MUST exist in the grouped frame. Order-insensitive
    * aggregates (`length`, `map|add`) ignore it. Making the ordering a
    * parameter keeps the dependency on the caller's bookkeeping columns
    * visible in the signature instead of implicit in column names.
    */
  final case class PerVector(outName: Column, builders: Seq[(String, Column => Column)]) {
    def aggs(ordering: Column): Seq[(String, Column)] =
      builders.map { case (k, f) => k -> f(ordering) }
    def keys: Seq[String] = builders.map(_._1)
  }

  /** Wrapped-value compiled form (steps with `wrap:`): row filter plus
    * the output VALUE rendered as JSON text — the wrap directive
    * supplies the event name.
    */
  final case class PerEventValue(filter: Option[Column], valueJson: Column)

  sealed trait Compiled
  final case class CompiledPerEvent(p: PerEvent) extends Compiled
  final case class CompiledPerVector(v: PerVector) extends Compiled
  /** `limit(n; .[] | ...)` — the per-event form plus a per-vector
    * output cap: the first n outputs of the inner stream in arrival
    * order, per vector (each event emits ≤ 1 output, so the first n
    * outputs are the outputs of the first n surviving events).
    */
  final case class CompiledPerEventLimited(p: PerEvent, n: Int) extends Compiled

  def tryCompile(expr: String): Option[Compiled] =
    try {
      val ast = flatten(expandLet(flatten(new Parser(expr).parsePipe())))
      compileTop(ast)
    } catch { case _: Exception => None }

  /** Compiled SINK-VECTOR form: `map(<.d-path>)` over a send step's
    * event vector — the reference's own send-http example
    * (`jq-expr: map(.d)` — one request body per vector, the array of
    * mapped values). The builder takes the arrival ordering column and
    * yields ONE aggregate Column rendering the whole body line: each
    * element re-renders through the variant round-trip, the same
    * normalization the vector lines themselves get (eventJson), so the
    * compiled body is byte-identical to piping those lines through the
    * jq binary (JqFuzzSpec differential). Null/absent elements render
    * as jq's `null` (array_join drops SQL nulls — the coalesce is
    * load-bearing).
    */
  def tryCompileSinkMap(expr: String): Option[Column => Column] =
    try {
      flatten(new Parser(expr).parsePipe()) match {
        case MapExpr(p: Path) if p.segs.headOption.contains(Left("d")) =>
          eventValue(p).map { c => (ord: Column) =>
            concat(lit("["), array_join(transform(
              array_sort(collect_list(struct(ord.as("__o"),
                coalesce(to_json(c), lit("null")).as("__v")))),
              x => x.getField("__v")), ","), lit("]"))
          }
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Expand `<path> as $x | body` bindings by substitution — sound
    * exactly when (a) the bound value is a plain path (evaluated on
    * the `.` flowing into the binding) and (b) every body stage before
    * the last is a `select(...)` (which passes `.` through unchanged),
    * so `$x` and the inlined path always see the same input. Anything
    * else raises → tryCompile's catch → the subprocess tier. A
    * substitution that misses a `$x` inside an unhandled node shape is
    * equally safe: the surviving [[VarPath]] fails compilation.
    */
  private def expandLet(ast: Ast): Ast = ast match {
    case PipeSeq(st) => flatten(PipeSeq(st.map(expandLet)))
    case LetBind(name, value, body0) =>
      val body = expandLet(body0)
      val p = value match {
        case pp: Path => pp
        case _ => throw new IllegalArgumentException(
          "jq compiled tier: non-path binding value — subprocess tier")
      }
      val stages = body match { case PipeSeq(s) => s; case s => Seq(s) }
      require(stages.init.forall(_.isInstanceOf[Select]),
        "jq compiled tier: binding across a re-rooting stage — subprocess tier")
      flatten(PipeSeq(stages.map(substVar(_, name, p))))
    case other => other
  }

  /** Replace `$name<segs>` with `<p><segs>` everywhere the AST shape is
    * known; unknown containers pass through unchanged (a surviving
    * VarPath inside one fails compilation — never a silent wrong
    * value). Inner binders of the same name shadow (their bodies are
    * left alone); `reduce` with the same variable likewise.
    */
  private def substVar(a: Ast, n: String, p: Path): Ast = a match {
    case VarPath(m, segs) if m == n => Path(p.segs ++ segs)
    case PipeSeq(s)   => PipeSeq(s.map(substVar(_, n, p)))
    case Select(c)    => Select(substVar(c, n, p))
    case ObjCons(fs)  => ObjCons(fs.map { case (k, v) => k -> substVar(v, n, p) })
    case Cmp(o, l, r) => Cmp(o, substVar(l, n, p), substVar(r, n, p))
    case Logic(o, l, r) => Logic(o, substVar(l, n, p), substVar(r, n, p))
    case Arith(o, l, r) => Arith(o, substVar(l, n, p), substVar(r, n, p))
    case IfElse(c, t, e) =>
      IfElse(substVar(c, n, p), substVar(t, n, p), substVar(e, n, p))
    case Alt(l, r)    => Alt(substVar(l, n, p), substVar(r, n, p))
    case StrInterp(parts) => StrInterp(parts.map {
      case Right(x) => Right(substVar(x, n, p)); case l => l })
    case MapExpr(i)   => MapExpr(substVar(i, n, p))
    case Reduce(src, v, init, upd) if v != n =>
      Reduce(substVar(src, n, p), v, substVar(init, n, p), substVar(upd, n, p))
    case LetBind(m, v, b) if m != n =>
      LetBind(m, substVar(v, n, p), substVar(b, n, p))
    case LetBind(m, v, b) => LetBind(m, substVar(v, n, p), b) // shadowed
    case other => other
  }

  /** Compile a wrapped value stream: `.[]<path> | <conditional-drop
    * stages> | .` — the stress-test filter shape. The final value must
    * be the rebound `.` (so jq's number formatting is reproduced
    * verbatim: the payload text passes through, never re-rendered from
    * a computed double).
    */
  def tryCompileWrapped(expr: String): Option[PerEventValue] =
    try {
      flatten(expandLet(flatten(new Parser(expr).parsePipe()))) match {
        case PipeSeq(IterateAll +: rest) if rest.nonEmpty => compileValueStages(rest)
        case _ => None
      }
    } catch { case _: Exception => None }

  /** `.[].d` parses as a nested pipe; flatten so stage lists are flat. */
  private def flatten(ast: Ast): Ast = ast match {
    case PipeSeq(stages) =>
      val fl = stages.flatMap { case PipeSeq(inner) => inner; case s => Seq(s) }
      if (fl.size == 1) fl.head else PipeSeq(fl)
    case other => other
  }

  // ---- parser (recursive descent) ----
  private final class Parser(src: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < src.length && src(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < src.length) src(pos) else '\u0000'
    private def eat(c: Char): Unit = {
      ws(); require(peek == c, s"expected '$c' at $pos"); pos += 1
    }
    private def tryEat(s: String): Boolean = {
      ws()
      if (src.startsWith(s, pos)) { pos += s.length; true } else false
    }
    private def ident(): String = {
      ws()
      val start = pos
      while (pos < src.length && (src(pos).isLetterOrDigit || src(pos) == '_')) pos += 1
      require(pos > start, s"expected identifier at $pos")
      src.substring(start, pos)
    }

    def parsePipe(): Ast = {
      val ast = parsePipeStages()
      ws()
      require(pos >= src.length, s"trailing input at $pos: '${src.drop(pos)}'")
      ast
    }

    /** `as $var` after a stage binds it over the REST of the pipe —
      * jq's binding scope. The lookahead requires a word boundary so
      * a leading identifier like `ascii_downcase` is never split.
      */
    private def parsePipeStages(): Ast = {
      val stages = Seq.newBuilder[Ast]
      var binding: Option[Ast] = None
      var done = false
      while (!done) {
        val st = parseAlt()
        ws()
        val atAs = src.startsWith("as", pos) &&
          (pos + 2 >= src.length ||
            (!src(pos + 2).isLetterOrDigit && src(pos + 2) != '_'))
        if (atAs) {
          pos += 2; ws()
          require(peek == '$', s"expected '$$var' after 'as' at $pos"); pos += 1
          val name = ident()
          ws(); require(tryEat("|"), s"expected '|' after binding at $pos"); ws()
          binding = Some(LetBind(name, st, parsePipeStages()))
          done = true
        } else {
          stages += st
          ws()
          if (tryEat("|")) ws() else done = true
        }
      }
      val s = stages.result() ++ binding
      if (s.size == 1) s.head else PipeSeq(s)
    }

    private def parseInnerPipe(): Ast = {
      val stages = Seq.newBuilder[Ast]
      stages += parseAlt()
      ws()
      if (src.startsWith("|=", pos)) {
        pos += 2
        val target = stages.result().head match {
          case p: Path => p
          case _ => throw new IllegalArgumentException(
            "|= target must be a plain path: subprocess tier")
        }
        return UpdatePath(target, parseInnerPipe())
      }
      while ({ ws(); peek == '|' && !src.startsWith("||", pos) &&
               !src.startsWith("|=", pos) }) { pos += 1; stages += parseAlt() }
      // splice desugared multi-stage atoms (del → entries idiom) so
      // chain matchers see a flat fn list
      val s = stages.result().flatMap {
        case PipeSeq(inner) => inner
        case x => Seq(x)
      }
      if (s.size == 1) s.head else PipeSeq(s)
    }

    // jq precedence puts `//` under `|` and above `or`
    private def parseAlt(): Ast = {
      var l = parseCmpOr()
      while ({ ws(); src.startsWith("//", pos) }) { pos += 2; l = Alt(l, parseCmpOr()) }
      l
    }

    private def parseCmpOr(): Ast = {
      var l = parseCmpAnd()
      while (tryEat("or") && { ws(); true }) l = Logic("or", l, parseCmpAnd())
      l
    }
    private def parseCmpAnd(): Ast = {
      var l = parseCmp()
      while (tryEat("and")) l = Logic("and", l, parseCmp())
      l
    }
    private def parseCmp(): Ast = {
      val l = parseAdditive()
      ws()
      val ops = Seq("==", "!=", "<=", ">=", "<", ">")
      ops.find(o => src.startsWith(o, pos)) match {
        case Some(o) => pos += o.length; Cmp(o, l, parseAdditive())
        case None    => l
      }
    }
    private def parseAdditive(): Ast = {
      var l = parseMultiplicative()
      ws()
      while (peek == '+' || (peek == '-' && !src.startsWith("->", pos))) {
        val op = peek.toString; pos += 1
        l = Arith(op, l, parseMultiplicative())
        ws()
      }
      l
    }
    private def parseMultiplicative(): Ast = {
      var l = parseAtom()
      ws()
      while (peek == '*' || (peek == '/' && !src.startsWith("//", pos)) || peek == '%') {
        val op = peek.toString; pos += 1
        l = Arith(op, l, parseAtom())
        ws()
      }
      l
    }

    private def parseAtom(): Ast = {
      ws()
      if (tryEat("select(")) { val c = parseInnerPipe(); eat(')'); Select(c) }
      else if (tryEat("map(")) { val c = parseInnerPipe(); eat(')'); MapExpr(c) }
      else if (tryEat("group_by(")) {
        val k = parseInnerPipe(); eat(')')
        k match {
          case p: Path => GroupByKey(p)
          case _ => throw new IllegalArgumentException("group_by key must be a path")
        }
      }
      else if (tryEat("unique_by(")) {
        val k = parseInnerPipe(); eat(')')
        k match {
          case p: Path => UniqueByKey(p)
          case _ => throw new IllegalArgumentException("unique_by key must be a path")
        }
      }
      else if (tryEat("split(")) { ws(); val s = parseString(); eat(')'); SplitFn(s) }
      else if (tryEat("join(")) { ws(); val s = parseString(); eat(')'); JoinFn(s) }
      else if (tryEat("ltrimstr(")) { ws(); val s = parseString(); eat(')'); Fn1("ltrimstr", Some(s)) }
      else if (tryEat("rtrimstr(")) { ws(); val s = parseString(); eat(')'); Fn1("rtrimstr", Some(s)) }
      else if (tryEat("startswith(")) { ws(); val s = parseString(); eat(')'); Fn1("startswith", Some(s)) }
      else if (tryEat("endswith(")) { ws(); val s = parseString(); eat(')'); Fn1("endswith", Some(s)) }
      else if (tryEat("test(")) {
        ws(); val s = parseString(); ws()
        if (peek == ';') {
          pos += 1; ws(); val flags = parseString(); eat(')')
          // only the "i" flag compiles; anything else → subprocess
          require(flags == "i", s"test flags '$flags': subprocess tier")
          Fn2("test_i", s, flags)
        } else { eat(')'); Fn1("test", Some(s)) }
      }
      else if (tryEat("has(")) { ws(); val s = parseString(); eat(')'); Fn1("has", Some(s)) }
      else if (tryEat("gsub(")) {
        ws(); val re = parseString(); eat(';'); ws(); val r = parseString(); eat(')')
        Fn2("gsub", re, r)
      }
      else if (tryEat("sub(")) {
        ws(); val re = parseString(); eat(';'); ws(); val r = parseString(); eat(')')
        Fn2("sub", re, r)
      }
      else if (tryEat("ascii_downcase")) Fn1("ascii_downcase", None)
      else if (tryEat("ascii_upcase")) Fn1("ascii_upcase", None)
      else if (tryEat("floor")) Fn1("floor", None)
      else if (tryEat("ceil")) Fn1("ceil", None)
      else if (tryEat("fabs")) Fn1("fabs", None)
      else if (tryEat("sqrt")) Fn1("sqrt", None)
      else if (tryEat("round")) Fn1("round", None)
      else if (tryEat("reverse")) Fn1("reverse", None)
      else if (tryEat("unique")) Fn1("unique", None) // `unique_by(` already matched above
      else if (tryEat("sort_by(")) {
        val k = parseInnerPipe(); eat(')')
        k match {
          case p: Path => SortByKey(p)
          case _ => throw new IllegalArgumentException("sort_by key must be a path")
        }
      }
      else if (tryEat("sort")) Fn1("sort", None)
      else if (tryEat("not")) Fn1("not", None)
      else if (tryEat("min_by(") || tryEat("max_by(")) {
        val isMax = src(pos - 6) == 'a' // m[a]x_by( just consumed
        val k = parseInnerPipe(); eat(')')
        k match {
          case p: Path => MinMaxByKey(p, isMax)
          case _ => throw new IllegalArgumentException("min_by/max_by key must be a path")
        }
      }
      else if (tryEat("min")) Fn1("min", None)
      else if (tryEat("max")) Fn1("max", None)
      else if (tryEat("length")) Length
      else if (tryEat("add")) Add
      else if (tryEat("any")) AnyAll(isAll = false)
      else if (tryEat("all")) AnyAll(isAll = true)
      else if (tryEat("limit(")) {
        ws()
        val start = pos
        while (pos < src.length && src(pos).isDigit) pos += 1
        require(pos > start, "limit needs an integer literal count")
        val n = src.substring(start, pos).toInt
        // jq 1.6's limit(0; g) BUG emits one output (fixed only in
        // 1.7) — the compiled tier must not be cleaner than the
        // binary the subprocess tier runs, so n = 0 falls back
        require(n >= 1, "jq 1.6 limit(0; g) emits one output — subprocess tier")
        ws(); eat(';')
        val body = parseInnerPipe(); eat(')')
        LimitN(n, body)
      }
      else if (tryEat("del(")) {
        // jq del(.k1, .k2) — desugared at parse time to the compiled
        // entries idiom: to_entries | map(select(.key != "k1" and …)) |
        // from_entries. Rides the existing whole-`.d` entries chain, so
        // it compiles exactly where that idiom does (`.d | del(.k)`);
        // nested-path deletion (del(.a.b)) falls to the subprocess.
        val keys = scala.collection.mutable.ArrayBuffer[String]()
        var more = true
        while (more) {
          ws(); eat('.')
          keys += ident()
          ws(); if (peek == ',') { pos += 1 } else more = false
        }
        eat(')')
        val cond = keys.map(k => Cmp("!=", Path(Seq(Left("key"))), Lit(k)): Ast)
          .reduce((a, b) => Logic("and", a, b))
        PipeSeq(Seq(ToEntries, MapExpr(Select(cond)), FromEntries))
      }
      else if (src.startsWith("first(", pos) || src.startsWith("last(", pos)) {
        // jq first(g)/last(g): g's first/last output — compiled for
        // g = `.[] | <path>` (the per-vector arrival-order form)
        val isLast = src(pos) == 'l'
        pos += (if (isLast) 5 else 6)
        val body = parseInnerPipe(); eat(')')
        body match {
          case PipeSeq(Seq(IterateAll, p: Path)) => FirstLast(p, isLast)
          case _ => throw new IllegalArgumentException(
            "first/last body beyond `.[] | path`: subprocess tier")
        }
      }
      else if (tryEat("with_entries(")) {
        // jq with_entries(f) ≡ to_entries | map(f) | from_entries —
        // desugared at parse time so it rides the compiled entries
        // chain exactly where that idiom does. Compiled bodies:
        // select(cond) (the filter-object face) and `.value |=
        // tostring/tonumber` (value normalization); anything else
        // (key rewrites, arbitrary updates) → subprocess tier.
        val body = parseInnerPipe(); eat(')')
        val inner = body match {
          case s: Select => MapExpr(s)
          case u @ UpdatePath(Path(Seq(Left("value"))), ToString | ToNumber) =>
            MapExpr(u)
          case _ => throw new IllegalArgumentException(
            "with_entries body beyond select / .value |= tostring|tonumber: subprocess tier")
        }
        PipeSeq(Seq(ToEntries, inner, FromEntries))
      }
      else if (tryEat("to_entries")) ToEntries
      else if (tryEat("from_entries")) FromEntries
      else if (tryEat("keys_unsorted")) KeysFn(sorted = false)
      else if (tryEat("keys")) KeysFn(sorted = true)
      else if (tryEat("reduce ")) {
        ws()
        val src0 = parsePath()
        ws(); require(tryEat("as"), s"expected 'as' in reduce at $pos"); ws()
        require(peek == '$', s"expected '$$var' in reduce at $pos"); pos += 1
        val v = ident()
        ws(); eat('(')
        val init = parseInnerPipe(); eat(';')
        val upd = parseInnerPipe(); eat(')')
        Reduce(src0, v, init, upd)
      }
      else if (peek == '$') {
        pos += 1
        val name = ident()
        if (pos < src.length && src(pos) == '.' &&
            pos + 1 < src.length && (src(pos + 1).isLetter || src(pos + 1) == '_')) {
          parsePath() match {
            case Path(segs) => VarPath(name, segs)
            case _ => throw new IllegalArgumentException(
              s"unsupported $$var path form at $pos: subprocess tier")
          }
        } else VarPath(name, Seq.empty)
      }
      else if (tryEat("tostring")) ToString
      else if (tryEat("tonumber")) ToNumber
      else if (tryEat("tojson")) ToJson
      else if (tryEat("fromjson")) FromJson
      else if (tryEat("@csv")) FormatCsv
      else if (tryEat("@base64")) FormatBase64
      else if (tryEat("empty")) Empty
      else if (tryEat("fmod(")) {
        val a = parseInnerPipe(); eat(';'); val b = parseInnerPipe(); eat(')')
        Arith("%", a, b) // C fmod semantics = Spark's % on doubles
      }
      else if (tryEat("if ") || tryEat("if(")) {
        if (src(pos - 1) == '(') pos -= 1 // `if (cond)` — keep the paren for the cond
        val c = parseInnerPipe()
        require(tryEat("then"), s"expected 'then' at $pos")
        val t = parseInnerPipe()
        require(tryEat("else"), s"expected 'else' at $pos")
        val e = parseInnerPipe()
        require(tryEat("end"), s"expected 'end' at $pos")
        IfElse(c, t, e)
      }
      else if (peek == '{') parseObj()
      else if (peek == '.') parsePath()
      else if (peek == '"') parseStringOrInterp()
      else if (tryEat("true")) Lit(true)
      else if (tryEat("false")) Lit(false)
      else if (tryEat("null")) Lit(null)
      else if (peek == '(') { eat('('); val e = parseInnerPipe(); eat(')'); e }
      else parseNumber()
    }

    private def parseObj(): Ast = {
      eat('{')
      val fields = Seq.newBuilder[(String, Ast)]
      var more = true
      while (more) {
        ws()
        val k = if (peek == '"') parseString() else ident()
        eat(':')
        fields += (k -> parseInnerPipe())
        ws()
        more = peek == ','
        if (more) pos += 1
      }
      eat('}')
      ObjCons(fields.result())
    }

    private def parsePath(): Ast = {
      eat('.')
      val segs = scala.collection.mutable.ArrayBuffer[Either[String, Int]]()
      var iterate = false
      var idx0 = false
      var done = false
      var first = true
      while (!done) {
        if (peek == '[') {
          pos += 1; ws()
          if (peek == ']') { // .[] — iterate; trailing segs keep parsing (`.[].d`)
            pos += 1
            require(first && segs.isEmpty, s"'.[]' only supported at path start ($pos)")
            iterate = true; first = false
          }
          else {
            val n = parseNumber().asInstanceOf[Lit].v.asInstanceOf[Double].toInt
            ws()
            if (peek == ':') {
              // jq slice `p[from:to]` — TRAILING only (anything after
              // the slice breaks the outer parse -> subprocess tier)
              pos += 1; ws()
              val m = parseNumber().asInstanceOf[Lit].v.asInstanceOf[Double].toInt
              eat(']')
              require(n >= 0 && m >= n, s"slice [$n:$m]: subprocess tier")
              require(!iterate && !idx0, "slice after .[] or [0]: subprocess tier")
              return if (segs.nonEmpty) PipeSeq(Seq(Path(segs.toSeq), Slice(n, m)))
                     else Slice(n, m)
            }
            eat(']')
            if (first && n == 0 && segs.isEmpty) idx0 = true
            else segs += Right(n)
            first = false
          }
        } else if (peek.isLetter || peek == '_') {
          segs += Left(ident()); first = false
        } else if (peek == '.' && pos + 1 < src.length &&
                   (src(pos + 1).isLetter || src(pos + 1) == '_' || src(pos + 1) == '[')) {
          pos += 1 // segment separator
        } else done = true
      }
      if (iterate && segs.isEmpty) IterateAll
      else if (iterate) PipeSeq(Seq(IterateAll, Path(segs.toSeq)))
      else if (idx0) First(Path(segs.toSeq))
      else Path(segs.toSeq)
    }

    /** A string literal that may carry jq interpolations `\(expr)`.
      * Pure literals stay `Lit`; interpolated ones become [[StrInterp]]
      * with the inner exprs parsed by the full grammar.
      */
    private def parseStringOrInterp(): Ast = {
      eat('"')
      val parts = Seq.newBuilder[Either[String, Ast]]
      val sb = new StringBuilder
      var interp = false
      while (pos < src.length && src(pos) != '"') {
        if (src(pos) == '\\' && pos + 1 < src.length && src(pos + 1) == '(') {
          pos += 2
          if (sb.nonEmpty) { parts += Left(sb.toString); sb.clear() }
          parts += Right(parseInnerPipe())
          eat(')')
          interp = true
        } else if (src(pos) == '\\') {
          pos += 1
          require(pos < src.length, "unterminated escape in string literal")
          sb.append(decodeEscape()); pos += 1
        } else { sb.append(src(pos)); pos += 1 }
      }
      require(pos < src.length, "unterminated string literal")
      pos += 1
      if (!interp) Lit(sb.toString)
      else {
        if (sb.nonEmpty) parts += Left(sb.toString)
        StrInterp(parts.result())
      }
    }

    private def decodeEscape(): Char = src(pos) match {
      case 'n' => '\n'
      case 't' => '\t'
      case 'r' => '\r'
      case 'b' => '\b'
      case 'f' => '\f'
      case '"' => '"'
      case '\\' => '\\'
      case '/' => '/'
      case 'u' =>
        require(pos + 4 < src.length, "unterminated \\u escape")
        val cp = Integer.parseInt(src.substring(pos + 1, pos + 5), 16)
        pos += 4
        cp.toChar
      case other =>
        // unknown escapes are a compile failure => subprocess tier
        throw new IllegalArgumentException(s"unsupported escape \\$other in string literal")
    }

    private def parseString(): String = {
      eat('"')
      val sb = new StringBuilder
      while (pos < src.length && src(pos) != '"') {
        if (src(pos) == '\\') {
          pos += 1
          require(pos < src.length, "unterminated escape in string literal")
          sb.append(decodeEscape()); pos += 1
        } else { sb.append(src(pos)); pos += 1 }
      }
      require(pos < src.length, "unterminated string literal")
      pos += 1
      sb.toString
    }

    private def parseNumber(): Ast = {
      ws()
      val start = pos
      if (peek == '-') pos += 1
      while (pos < src.length && (src(pos).isDigit || src(pos) == '.')) pos += 1
      require(pos > start, s"expected number at $pos")
      Lit(src.substring(start, pos).toDouble)
    }
  }

  // ---- compilation ----

  private def compileTop(ast: Ast): Option[Compiled] = ast match {
    // `.[] | stages...` => per-event
    case PipeSeq(IterateAll +: rest) if rest.nonEmpty => compilePerEvent(rest)
    case IterateAll => compilePerEvent(Seq(Path(Seq.empty)))
    // `limit(n; .[] | ...)` => per-event capped at n outputs per vector
    case LimitN(n, body) =>
      flatten(body) match {
        case PipeSeq(IterateAll +: rest) if rest.nonEmpty =>
          compilePerEvent(rest).collect {
            case CompiledPerEvent(pe) => CompiledPerEventLimited(pe, n)
          }
        case _ => None
      }
    // vector-level object construction => per-vector aggregates
    case o: ObjCons => compilePerVector(o)
    case _ => None
  }

  /** Payload source for `.d` paths. Default: parse the `d` JSON-string
    * column at each access. The VARIANT payload tier (`payload-tier:
    * variant`, SURVEY §1.3 — Spark 4's VariantType) rebinds this to a
    * pre-parsed `__dv` variant column for the duration of plan
    * construction, so chained compiled steps read the binary variant
    * encoding instead of re-parsing JSON text per access.
    */
  val payloadSource = new scala.util.DynamicVariable[() => Column](
    () => try_parse_json(col("d")))

  /** Event-scope value: path over {n, d, t} columns. */
  private def eventValue(p: Path): Option[Column] = p.segs match {
    case Seq() => None // bare `.` as a value isn't expressible columnarly
    case Left("n") +: Nil => Some(col("n"))
    case Left("d") +: rest =>
      val jsonPath = "$" + rest.map {
        case Left(f)  => s".$f"
        case Right(i) => s"[$i]"
      }.mkString
      val pv = payloadSource.value()
      Some(
        if (rest.isEmpty) pv.cast("variant")
        else try_variant_get(pv, jsonPath, "variant"))
    case Left("t") +: Right(i) +: Left(f) +: Nil =>
      Some(element_at(col("t"), i + 1).getField(f))
    case _ => None
  }

  private def boolCond(ast: Ast): Option[Column] = ast match {
    case Cmp(op, l, r) =>
      for { lc <- numOrStr(l, r); rc <- numOrStr(r, l) } yield op match {
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case "<"  => lc < rc
        case "<=" => lc <= rc
        case ">"  => lc > rc
        case ">=" => lc >= rc
      }
    case Logic("and", l, r) => for { a <- boolCond(l); b <- boolCond(r) } yield a && b
    case Logic("or", l, r)  => for { a <- boolCond(l); b <- boolCond(r) } yield a || b
    // boolean-ended chains as conditions: `select(.d.s | test("re"))`,
    // `select(.n | startswith("a") | not)`
    case PipeSeq((p: Path) +: fns) if fns.nonEmpty && fns.forall(isChainFn) =>
      chainValueKind(p, fns).collect { case (c, 'b') => c }
    case _ => None
  }

  /** Operand typed by its partner: string literals compare as strings,
    * otherwise numeric (jq numbers are doubles).
    */
  private def numOrStr(a: Ast, partner: Ast): Option[Column] = (a, partner) match {
    case (Lit(s: String), _) => Some(lit(s))
    // typed chains as comparison operands, kind-aligned with the
    // partner: `(.d.s | length) > 3` (numeric), `(.d.s | gsub(..)) ==
    // "x"` (string) — misaligned kinds would hit jq's cross-type
    // ordering, which is not columnar-expressible → subprocess
    case (PipeSeq((p: Path) +: fns), _) if fns.nonEmpty && fns.forall(isChainFn) =>
      // partner must be STATICALLY kind-aligned: a bare-path partner's
      // runtime kind is unknown, and jq's cross-type ordering (numbers
      // below strings) is not columnar-expressible — assuming numeric
      // would silently cast a string partner to null. Unknown-kind
      // partners refuse to compile → subprocess tier.
      val strPartner = partner match {
        case Lit(_: String)                  => true
        case PipeSeq(Seq(_: Path, ToString)) => true
        case _                               => false
      }
      val numPartner = partner match {
        case Lit(_: Double)                  => true
        case Arith(_, _, _)                  => true
        case PipeSeq(Seq(_: Path, ToNumber)) => true
        case PipeSeq((p2: Path) +: fns2) if fns2.nonEmpty && fns2.forall(isChainFn) =>
          chainValueKind(p2, fns2).exists(_._2 == 'n')
        case _                               => false
      }
      chainValueKind(p, fns).collect {
        case (c, 'n') if numPartner => c
        case (c, 's') if strPartner => c
      }
    case (Lit(d: Double), _) => Some(lit(d))
    case (Lit(b: Boolean), _) => Some(lit(b))
    case (p: Path, Lit(_: String)) => eventValue(p).map(_.cast("string"))
    case (p: Path, _) => eventValue(p).map(_.cast("double"))
    case (PipeSeq(Seq(p: Path, ToNumber)), _) => toNumberOf(p)
    case (PipeSeq(Seq(p: Path, ToString)), _) => toStringOf(p)
    case (Arith(op, l, r), _) => arith(op, l, r)
    // `path // literal` as a NUMERIC operand (the select((.d.x // 0) > k)
    // idiom): falsy takes the default, a numeric variant casts
    // directly, and any OTHER runtime kind raises loudly — jq's
    // cross-type ordering (strings sort above all numbers) is not
    // columnar-expressible, so divergence must be observable, not a
    // silent null-compare (same contract as tonumber/tostring).
    case (Alt(p @ Path(Left("d") +: _), Lit(dflt: Double)), partner)
        // Same alignment gate as chain operands above: a string-literal
        // or string-kinded partner would make this a number-vs-string
        // compare, which jq resolves by cross-type ordering (always
        // unequal, numbers sort below strings) but SQL would evaluate
        // as a silent null-compare. Refuse → subprocess tier.
        if (partner match {
          case Lit(_: String)                  => false
          case PipeSeq(Seq(_: Path, ToString)) => false
          case PipeSeq((p2: Path) +: fns2) if fns2.nonEmpty && fns2.forall(isChainFn) =>
            chainValueKind(p2, fns2).exists(_._2 == 'n')
          case _ => true
        }) =>
      eventValue(p).map { pv =>
        val t = schema_of_variant(pv)
        val falsy = pv.isNull || t === lit("VOID") ||
          (t === lit("BOOLEAN") && pv.cast("string") === lit("false"))
        val isNum = t.isin("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT") ||
          t.startsWith("DECIMAL")
        when(falsy, lit(dflt))
          .otherwise(when(isNum, pv.cast("double")).otherwise(
            raise_error(concat(
              lit("jq compiled tier: `//` in a numeric position saw a "), t,
              lit(" value (jq would apply cross-type ordering); run this step via the subprocess tier")))
              .cast("double")))
      }
    case _ => None
  }

  /** jq `tonumber`: numbers pass, strings parse. The variant→string→
    * double chain covers both in one expression. jq RAISES on a
    * non-numeric string; SQL's cast yields null — which would silently
    * flow into comparisons as false. Divergence must be observable, so
    * an unparsable non-null input fails the query loudly with a
    * pointer at the subprocess tier (real pipelines apply tonumber to
    * numeric-string fields and never hit this).
    */
  private def toNumberOf(p: Path): Option[Column] =
    eventValue(p).map { v =>
      val s = v.cast("string")
      val d = s.try_cast("double") // ANSI cast would throw generically; we want our message
      when(s.isNotNull && d.isNull,
        raise_error(concat(lit("jq compiled tier: tonumber cannot parse \""), s,
          lit("\" (jq raises here); run this step via the subprocess tier"))).cast("double"))
        .otherwise(d)
    }

  /** jq `tostring`: strings/booleans pass through; numbers render
    * jq-style. Exact envelope: integral values below 1e15 drop the
    * decimal point (`1` not `1.0`), and non-integral values with
    * 1e-3 ≤ |d| < 1e7 print identically under Java's shortest-decimal
    * plain notation and jq's dtoa (both plain, same digits). OUTSIDE
    * that envelope (≥1e15 integral, tiny/huge non-integral) Java flips
    * to scientific notation (`1.0E20`) where jq does not — a silent
    * wrong answer, so the expression raises instead, naming the
    * subprocess tier as the escape hatch. Pipeline tostrings are
    * names/ids/categories, not astronomic doubles, so the envelope
    * covers real use.
    */
  private def toStringOf(p: Path): Option[Column] = p.segs match {
    case Left("n") +: Nil => Some(col("n"))
    case Left("d") +: _ => eventValue(p).map { v =>
      val t = schema_of_variant(v)
      val d = v.cast("string").cast("double")
      val a = abs(d)
      when(v.isNull, lit("null"))
        .when(t === lit("STRING") || t === lit("BOOLEAN"), v.cast("string"))
        .otherwise(
          when(d === floor(d) && a < lit(1e15), d.cast("long").cast("string"))
            .when(d =!= floor(d) && a >= lit(1e-3) && a < lit(1e7), d.cast("string"))
            .otherwise(raise_error(concat(
              lit("jq compiled tier: tostring of "), d.cast("string"),
              lit(" is outside the exact rendering envelope (would print Java-style, not jq-style); run this step via the subprocess tier")))))
    }
    case _ => None
  }

  /** jq-exact number TEXT for a double column — the [[toStringOf]]
    * envelope factored out: integral < 1e15 prints without the
    * decimal point, non-integral inside [1e-3, 1e7) prints
    * Java-shortest == jq-dtoa, anything else raises (Java would flip
    * to scientific notation where jq does not).
    */
  private def jqNumText(d: Column): Column = {
    val a = abs(d)
    when(d === floor(d) && a < lit(1e15), d.cast("long").cast("string"))
      .when(d =!= floor(d) && a >= lit(1e-3) && a < lit(1e7), d.cast("string"))
      .otherwise(raise_error(concat(
        lit("jq compiled tier: number "), d.cast("string"),
        lit(" is outside the exact rendering envelope (would print Java-style, not jq-style); run this step via the subprocess tier"))))
  }

  private val variantNumKinds =
    Seq("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT")

  /** with_entries `.value |= tostring` on one entry value: scalars
    * normalize to a jq-rendered JSON string; objects/arrays raise —
    * their text would re-render through the variant (sorted keys),
    * a silent divergence from jq's document-order rendering.
    */
  private def entryToString(v: Column): Column = {
    val t = schema_of_variant(v)
    when(t === lit("VOID"), parse_json(lit("\"null\"")))
      .when(t === lit("STRING"), v)
      .when(t === lit("BOOLEAN"),
        parse_json(concat(lit("\""), v.cast("string"), lit("\""))))
      .when(t.isin(variantNumKinds: _*) || t.startsWith("DECIMAL"),
        parse_json(concat(lit("\""),
          jqNumText(v.cast("string").cast("double")), lit("\""))))
      .otherwise(raise_error(lit(
        "jq compiled tier: with_entries tostring on an object/array value (variant rendering would reorder keys); run this step via the subprocess tier"))
        .cast(org.apache.spark.sql.types.VariantType))
  }

  /** jq's implicit `@text` conversion (tostring semantics) for a
    * variant scalar, as a plain STRING column: strings/booleans pass,
    * numbers render through the exact envelope, null is "null",
    * objects/arrays raise (variant rendering would reorder keys).
    */
  private def jqToText(v: Column): Column = {
    val t = schema_of_variant(v)
    when(t === lit("VOID"), lit("null"))
      .when(t === lit("STRING") || t === lit("BOOLEAN"), v.cast("string"))
      .when(t.isin(variantNumKinds: _*) || t.startsWith("DECIMAL"),
        jqNumText(v.cast("string").cast("double")))
      .otherwise(raise_error(concat(
        lit("jq compiled tier: string conversion of a "), t,
        lit(" value (variant rendering would reorder keys); run this step via the subprocess tier"))))
  }

  /** JSON-quote a string column with full escaping — to_json's own
    * escaper via the struct-strip idiom.
    */
  private def jsonQuoteCol(s: Column): Column = {
    val j = to_json(struct(s.as("v")))
    j.substr(lit(6), length(j) - 6)
  }

  /** One jq `@csv` cell: strings CSV-quote (embedded quotes double),
    * numbers render bare through the exact envelope, null is the
    * empty cell; booleans/objects raise exactly where jq raises.
    */
  private def csvCell(v: Column): Column = {
    val t = schema_of_variant(v)
    when(v.isNull || t === lit("VOID"), lit(""))
      .when(t === lit("STRING"),
        concat(lit("\""), regexp_replace(v.cast("string"), "\"", "\"\""), lit("\"")))
      .when(t.isin(variantNumKinds: _*) || t.startsWith("DECIMAL"),
        jqNumText(v.cast("string").cast("double")))
      .otherwise(raise_error(concat(
        lit("jq compiled tier: @csv saw a "), t,
        lit(" cell (jq raises on booleans/objects in csv rows); run this step via the subprocess tier"))))
  }

  /** with_entries `.value |= tonumber`: numbers pass VERBATIM (an
    * integer stays an integer), numeric strings re-parse through the
    * jq rendering envelope, anything else raises like jq does.
    */
  private def entryToNumber(v: Column): Column = {
    val t = schema_of_variant(v)
    val s = v.cast("string")
    val d = s.try_cast("double")
    when(t.isin(variantNumKinds: _*) || t.startsWith("DECIMAL"), v)
      .when(t === lit("STRING") && d.isNotNull, parse_json(jqNumText(d)))
      .otherwise(raise_error(concat(
        lit("jq compiled tier: tonumber cannot parse "),
        coalesce(s, lit("null")),
        lit(" (jq raises here); run this step via the subprocess tier")))
        .cast(org.apache.spark.sql.types.VariantType))
  }

  private def arith(op: String, l: Ast, r: Ast): Option[Column] =
    for { lc <- numOrStr(l, r); rc <- numOrStr(r, l) } yield op match {
      case "+" => lc + rc
      case "-" => lc - rc
      case "*" => lc * rc
      case "/" => lc / rc
      case "%" => lc % rc
    }

  /** Value-form `if` with DYNAMICALLY-typed branches (the
    * `if c then .d.k else 0 end` shape — round-16 inventory widening):
    * when the static-kind proof of [[valueExpr]] fails, both branches
    * ride the VARIANT envelope — `.d` path values verbatim, literals
    * as their JSON text — so the when() is single-typed and the
    * RUNTIME kind flows through to the JSON renderer, like jq's. Only
    * offered in JSON-VALUE positions (object fields / whole payload):
    * a string-kinded variant renders WITH quotes, so comparison
    * operands and interpolations stay on the kind-proved path.
    */
  private def variantIf(a: Ast): Option[Column] = a match {
    case IfElse(c, t, e) =>
      for { cc <- boolCond(c); tc <- variantValue(t); ec <- variantValue(e) }
        yield when(cc, tc).otherwise(ec)
    case _ => None
  }

  private def variantValue(a: Ast): Option[Column] = a match {
    case p: Path if p.segs.headOption.contains(Left("d")) => eventValue(p)
    case Lit(d: Double) =>
      // integer-valued literals render integer, like jq's number output
      val txt = if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString
                else d.toString
      Some(try_parse_json(lit(txt)))
    case Lit(s: String)  => Some(try_parse_json(lit(jsonQuote(s))))
    case Lit(b: Boolean) => Some(try_parse_json(lit(b.toString)))
    case Lit(null)       => Some(try_parse_json(lit("null")))
    case ife: IfElse     => variantIf(ife) // nested ifs compose
    // jq `fromjson` on a string field: the parsed value rides the
    // variant envelope so its runtime kind flows to the renderer.
    // Values containing OBJECTS anywhere raise (the variant encoding
    // sorts object keys — jq re-renders in document order); scalars
    // and arrays-of-scalars are order-exact. Unparsable text raises
    // where jq raises.
    case PipeSeq(Seq(p: Path, FromJson)) =>
      eventValue(p).map { v =>
        val s = v.cast("string")
        val parsed = try_parse_json(s)
        val t = schema_of_variant(parsed)
        when(schema_of_variant(v) =!= lit("STRING"), raise_error(lit(
          "jq compiled tier: fromjson of a non-string (jq raises here); run this step via the subprocess tier")).cast(org.apache.spark.sql.types.VariantType))
          .when(parsed.isNull, raise_error(concat(
            lit("jq compiled tier: fromjson cannot parse "), coalesce(s, lit("null")),
            lit(" (jq raises here); run this step via the subprocess tier")))
            .cast(org.apache.spark.sql.types.VariantType))
          .when(t.contains("OBJECT") || t.contains("STRUCT"), raise_error(lit(
            "jq compiled tier: fromjson yielded an object (variant rendering would reorder keys); run this step via the subprocess tier")).cast(org.apache.spark.sql.types.VariantType))
          .otherwise(parsed)
      }
    case _ => None
  }

  /** jq object merge `.d + {k: v, …}` as one columnar expression:
    * document key order is PRESERVED (from_json to a map keeps it —
    * the same contract to_entries rides), keys present in the payload
    * are overwritten IN PLACE, new keys append in literal order —
    * exactly jq's `+` on objects. Values ride the variant envelope
    * (literals as their JSON text, `.d` paths verbatim, value-ifs).
    * A non-object payload raises with the subprocess pointer (jq
    * errors there too, except `null + obj` — rare enough to leave on
    * the subprocess tier rather than special-case silently).
    */
  private def objectMergeExpr(fields: Seq[(String, Ast)]): Option[Column] = {
    val vals = fields.map { case (k, v) => k -> variantValue(v) }
    if (vals.exists(_._2.isEmpty)) return None
    val t = schema_of_variant(try_parse_json(col("d")))
    var c: Column = map_entries(from_json(col("d"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.VariantType)))
    vals.foreach {
      case (k, Some(vc)) =>
        val present = exists(c, e => e.getField("key") === lit(k))
        val replaced = transform(c, e => struct(e.getField("key").as("key"),
          when(e.getField("key") === lit(k), vc)
            .otherwise(e.getField("value")).as("value")))
        c = when(present, replaced)
          .otherwise(concat(c, array(struct(lit(k).as("key"), vc.as("value")))))
      case _ => ()
    }
    Some(when(t.startsWith("OBJECT"), to_json(map_from_entries(c)))
      .otherwise(raise_error(concat(
        lit("jq compiled tier: object merge `+` saw a non-object payload ("),
        coalesce(t, lit("null")),
        lit("); run this step via the subprocess tier")))))
  }

  private def jsonQuote(s: String): String = {
    val sb = new java.lang.StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** A value rendered as JSON text (for the d payload). */
  private def jsonValueExpr(ast: Ast): Option[Column] = ast match {
    case ObjCons(fields) =>
      val cols = fields.map { case (k, v) =>
        (valueExpr(v) orElse variantIf(v) orElse (v match {
          case fj @ PipeSeq(Seq(_: Path, FromJson)) => variantValue(fj)
          case _ => None
        })).map(_.as(k)) }
      if (cols.exists(_.isEmpty)) None else Some(to_json(struct(cols.flatten: _*)))
    // a from_entries-terminated chain IS JSON text already (the
    // filter-object-by-entries idiom); nested inside an object it
    // would double-escape, so only the whole-payload position compiles
    case PipeSeq((p: Path) +: fns)
        if fns.lastOption.contains(FromEntries) && fns.forall(isChainFn) =>
      chainValueKind(p, fns).collect { case (c, 'j') => c }
    // jq object merge `.d + {…}` — whole-payload position only, like
    // the entries idiom (the result is JSON text already)
    case Arith("+", Path(Seq(Left("d"))), ObjCons(fields)) =>
      objectMergeExpr(fields)
    case other => (valueExpr(other) orElse variantIf(other)).map(c =>
      to_json(struct(c.as("v"))).substr(
        lit(6), length(to_json(struct(c.as("v")))) - 6))
  }

  private def valueExpr(ast: Ast): Option[Column] = ast match {
    case p: Path          => eventValue(p)
    case Lit(s: String)   => Some(lit(s))
    case Lit(d: Double)   => Some(lit(d))
    case Lit(b: Boolean)  => Some(lit(b))
    case Lit(null)        => Some(lit(null))
    case PipeSeq(Seq(p: Path, ToNumber)) => toNumberOf(p)
    case PipeSeq(Seq(p: Path, ToString)) => toStringOf(p)
    // jq string slice `p[from:to]`: CODEPOINT-indexed, exactly SQL
    // substring's unit (both clamp out-of-range). Non-string values
    // raise with the subprocess pointer — jq's array slice in a
    // scalar position isn't kind-provable here.
    // jq `@base64`: implicit @text conversion, then RFC 4648 base64
    // of the UTF-8 bytes — identical alphabet/padding to Spark's
    case PipeSeq(Seq(p: Path, FormatBase64)) => p.segs match {
      case Seq(Left("n")) => Some(base64(col("n").cast("binary")))
      // whole-`.d` is REFUSED at compile time, not gated at runtime:
      // the payload is an object in essentially every real pipeline,
      // so compiling it would turn a working subprocess fallback into
      // a guaranteed runtime raise. Subpaths are typically scalars —
      // they compile with the runtime kind gate.
      case Seq(Left("d")) => None
      case _ => eventValue(p).map(v => base64(jqToText(v).cast("binary")))
    }
    // jq `tojson` for SCALAR values: strings JSON-quote with full
    // escaping, numbers render through the exact envelope, booleans
    // and null print their literals; objects/arrays stay on the
    // subprocess tier (jq re-renders them in document order, which
    // the variant encoding normalizes away)
    case PipeSeq(Seq(p: Path, ToJson)) => p.segs match {
      case Seq(Left("n")) => Some(jsonQuoteCol(col("n")))
      case Seq(Left("d")) => None // see FormatBase64: object-certain, stay subprocess
      case _ => eventValue(p).map { v =>
        val t = schema_of_variant(v)
        when(t === lit("VOID"), lit("null"))
          .when(t === lit("STRING"), jsonQuoteCol(v.cast("string")))
          .when(t === lit("BOOLEAN"), v.cast("string"))
          .when(t.isin(variantNumKinds: _*) || t.startsWith("DECIMAL"),
            jqNumText(v.cast("string").cast("double")))
          .otherwise(raise_error(concat(
            lit("jq compiled tier: tojson of a "), t,
            lit(" value (variant rendering would reorder keys); run this step via the subprocess tier"))))
      }
    }
    case PipeSeq(Seq(p: Path, Slice(a, b))) => p.segs match {
      case Seq(Left("n")) => // statically a string column
        Some(substring(col("n"), a + 1, b - a))
      case _ => eventValue(p).map { v =>
        val t = schema_of_variant(v)
        when(t === lit("STRING"), substring(v.cast("string"), a + 1, b - a))
          .otherwise(raise_error(concat(
            lit("jq compiled tier: slice on a "), coalesce(t, lit("null")),
            lit(" value (only string slices compile as scalars); run this step via the subprocess tier"))))
      }
    }
    case si: StrInterp    => interpString(si)
    case PipeSeq((p: Path) +: fns) if fns.nonEmpty && fns.forall(isChainFn) =>
      chainValue(p, fns)
    case Arith(op, l, r)  => arith(op, l, r)
    case c: Cmp           => boolCond(c)
    case l: Logic         => boolCond(l)
    // value-form `if c then a else b end`: the condition must be a
    // compilable boolean (comparisons/logic — jq's bare-path
    // truthiness stays on the subprocess tier) and both branches must
    // share a static kind so the when() is single-typed
    case IfElse(c, t, e) =>
      for { kt <- kindOf(t); ke <- kindOf(e); if kt == ke
            cc <- boolCond(c); tc <- valueExpr(t); ec <- valueExpr(e) }
        yield when(cc, tc).otherwise(ec)
    case a: Alt           => altValue(a)
    case _ => None
  }

  /** Static kind of a value expression: 's'tring / 'n'umber /
    * 'b'oolean. Bare paths are dynamically typed → None (subprocess).
    */
  private def kindOf(a: Ast): Option[Char] = a match {
    case Lit(_: String) | _: StrInterp           => Some('s')
    case PipeSeq(Seq(_: Path, ToString))         => Some('s')
    case PipeSeq(Seq(_: Path, Slice(_, _)))      => Some('s')
    case PipeSeq(Seq(_: Path, FormatBase64))     => Some('s')
    case PipeSeq(Seq(_: Path, ToJson))           => Some('s')
    case Lit(_: Double)                          => Some('n')
    case PipeSeq(Seq(_: Path, ToNumber))         => Some('n')
    case Arith(_, _, _)                          => Some('n')
    case Lit(_: Boolean) | _: Cmp | _: Logic     => Some('b')
    case IfElse(_, t, e) =>
      for { kt <- kindOf(t); ke <- kindOf(e); if kt == ke } yield kt
    case PipeSeq((_: Path) +: fns) if fns.nonEmpty && fns.forall(isChainFn) =>
      fns.last match {
        case JoinFn(_)                     => Some('s')
        case Length                        => Some('n')
        case Fn1(n, _) if MathFns(n)       => Some('n')
        case Fn1(n, _) if StrFns(n)        => Some('s')
        case Fn1(n, _) if BoolFns(n)       => Some('b')
        case Fn1("not", _)                 => Some('b')
        case Fn1("min" | "max", _)         => Some('s') // element of a split array
        case Fn2("test_i", _, _)           => Some('b')
        case Fn2(_, _, _)                  => Some('s') // gsub/sub
        case _                             => None // ends on split/reverse/sort/unique → array
      }
    case _ => None
  }

  private val MathFns = Set("floor", "ceil", "fabs", "sqrt", "round")
  private val StrFns = Set("ltrimstr", "rtrimstr", "ascii_downcase", "ascii_upcase")
  /** string→boolean predicates (plus `has`: object→boolean). */
  private val BoolFns = Set("startswith", "endswith", "test", "has")
  /** array-kind transforms (reverse/sort/unique keep the array;
    * min/max collapse to an element). */
  private val ArrFns = Set("reverse", "sort", "unique", "min", "max")

  private def isChainFn(f: Ast): Boolean = f match {
    case _: SplitFn | _: JoinFn | Length => true
    case Fn1(n, _) => MathFns(n) || StrFns(n) || BoolFns(n) || ArrFns(n) || n == "not"
    case Fn2(n, _, _) => n == "gsub" || n == "sub" || n == "test_i"
    case ToEntries | FromEntries | _: KeysFn => true
    case MapExpr(Path(Seq(Left("key"))))     => true // entries .key projection
    case MapExpr(Select(_))                  => true // entries filter
    case MapExpr(UpdatePath(Path(Seq(Left("value"))), ToString | ToNumber)) =>
      true // with_entries value normalization
    case _ => false
  }

  /** Conservative common-dialect guard for compiled `test`/`gsub`/`sub`
    * regexes: accept only constructs whose semantics coincide between
    * Java's engine (Spark `rlike`/`regexp_replace`) and jq's Oniguruma
    * — literal chars, `\d \w \s \D \W \S` and escaped metachars,
    * classes `[...]` (literals, ranges, leading `^`), `.`, anchors
    * `^`/`$`, alternation, plain groups, and greedy quantifiers
    * `* + ? {m,n}`. Backrefs, lookaround, named groups, inline flags
    * (`(?`…), lazy/possessive quantifiers, and `\p` unicode properties
    * refuse to compile → subprocess tier. The pattern must also be
    * valid under java.util.regex (jq raises on an invalid regex; the
    * subprocess tier reproduces that error).
    */
  private[functions] def safeRegex(re: String): Boolean = {
    val litOk: Char => Boolean = ch =>
      ch.isLetterOrDigit || " _:,;=<>!@#%&'\"~/-".indexOf(ch) >= 0
    var i = 0
    var inClass = false
    var prevQuant = false // last token was a quantifier (reject `*?` lazy forms)
    while (i < re.length) {
      val ch = re(i)
      if (ch == '\\') {
        if (i + 1 >= re.length) return false
        val e = re(i + 1)
        if (!("dwsDWS".indexOf(e) >= 0 || "\\.^$|()[]{}*+?".indexOf(e) >= 0)) return false
        i += 2; prevQuant = false
      } else if (inClass) {
        // '&' refused INSIDE classes: Java parses [a&&b] as set
        // intersection, Oniguruma as two literal ampersands
        if (ch == ']') inClass = false
        else if (ch == '&') return false
        else if (!(litOk(ch) || ch == '-' || ch == '^' || ch == '.')) return false
        i += 1; prevQuant = false
      } else ch match {
        case '[' => inClass = true; i += 1; prevQuant = false
        case '(' =>
          if (i + 1 < re.length && re(i + 1) == '?') return false // (?...) groups/flags
          i += 1; prevQuant = false
        case '*' | '+' | '?' =>
          if (prevQuant) return false // lazy/possessive (`*?`, `++`, …)
          i += 1; prevQuant = true
        case '{' =>
          val close = re.indexOf('}', i)
          if (close < 0 || !re.substring(i + 1, close).matches("\\d+(,\\d*)?")) return false
          i = close + 1; prevQuant = true
        case c if litOk(c) || ")|.^$]".indexOf(c) >= 0 => i += 1; prevQuant = false
        case _ => return false
      }
    }
    !inClass && (try { java.util.regex.Pattern.compile(re); true }
                 catch { case _: Exception => false })
  }

  /** Literal replacement text for regexp_replace: `\` and `$` are
    * metacharacters in Java's replacement syntax.
    */
  private def escapeReplacement(repl: String): String =
    repl.replace("\\", "\\\\").replace("$", "\\$")

  /** Compiled-tier regex prefix: UNICODE_CHARACTER_CLASS, so Java's
    * predefined classes match Oniguruma's Unicode-aware `\w`/`\d`/`\s`
    * (verified against the jq binary on "été" / arabic digits / NBSP —
    * without it Java's ASCII-only classes silently diverge on any
    * non-ASCII data even under an all-ASCII pattern).
    */
  private def jre(re: String): String = "(?U)" + re

  /** jq `path // default`: the default when the path value is null,
    * absent, or boolean false (jq falsiness is exactly null and
    * false), else the path value UNCHANGED. The non-falsy side stays a
    * VARIANT and the default literal parses into one, so integers
    * render as integers and mixed-kind alternatives (jq-legal) stay
    * exact — no cast, no static-kind requirement. Non-literal
    * defaults and non-payload paths fall to the subprocess tier.
    */
  private def altValue(a: Alt): Option[Column] = a match {
    case Alt(p @ Path(Left("d") +: _), Lit(v)) =>
      eventValue(p).map { pv =>
        val t = schema_of_variant(pv)
        // a JSON null VALUE is a variant-null (schema VOID), not a SQL
        // NULL — jq treats both as falsy, so test both
        val isFalse = (t === lit("BOOLEAN") && pv.cast("string") === lit("false")) ||
          t === lit("VOID")
        val dJson = v match {
          case null      => "null"
          case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          case d: Double =>
            if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
          case b: Boolean => b.toString
        }
        when(pv.isNull || isFalse, parse_json(lit(dJson))).otherwise(pv)
      }
    case Alt(Path(Left("n") +: Nil), Lit(_)) =>
      // `.n // dflt`: the envelope name is a non-null string column
      Some(col("n"))
    case _ => None
  }

  /** jq string interpolation `"a\(expr)b"`: each interpolated value
    * renders as its `tostring` (strings unquoted, numbers jq-style via
    * [[toStringOf]]'s exact envelope, null as "null").
    */
  private def interpString(si: StrInterp): Option[Column] = {
    val parts = si.parts.map {
      case Left(s)  => Some(lit(s))
      case Right(p: Path) => toStringOf(p)
      case Right(Lit(s: String)) => Some(lit(s))
      case Right(Lit(d: Double)) =>
        Some(lit(if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString))
      case Right(PipeSeq(Seq(p: Path, ToString))) => toStringOf(p)
      case _ => None
    }
    if (parts.exists(_.isEmpty)) None else Some(concat(parts.flatten: _*))
  }

  /** Typed function chains over a path: string functions (`split`,
    * `join`, `ltrimstr`/`rtrimstr`, `ascii_downcase`/`ascii_upcase`),
    * math functions (`floor`/`ceil`/`fabs`/`sqrt`), and `length` over
    * the intermediate array — a small kind state machine
    * (variant → string/number/array) so an ill-typed chain refuses to
    * compile and falls to the subprocess tier. Where jq ERRORS on a
    * wrong runtime kind (string function on a number, math on a
    * string, sqrt of a negative), the compiled column raises loudly
    * with a pointer at the subprocess tier instead of silently
    * casting — the tonumber/tostring observability contract.
    */
  private def chainValue(p: Path, fns: Seq[Ast]): Option[Column] =
    chainValueKind(p, fns).map(_._1)

  private def chainValueKind(p: Path, fns: Seq[Ast]): Option[(Column, Char)] = {
    val pv = eventValue(p).getOrElse(return None)
    def strict(cond: Column, v: Column, what: String, tpe: String): Column =
      when(cond, v).otherwise(raise_error(concat(
        lit(s"jq compiled tier: $what saw a non-$tpe value (jq raises here); run this step via the subprocess tier"))).cast(tpe))
    // `.n` starts as a plain STRING column; `.d...` paths start as
    // variants whose runtime kind gates each function; trace paths
    // carry mixed static types — subprocess tier
    val isVariant = p.segs.headOption.contains(Left("d"))
    if (!isVariant && p.segs != Seq(Left("n"))) return None
    val t = if (isVariant) schema_of_variant(pv) else lit("STRING")
    val isNum = t.isin("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT") ||
      t.startsWith("DECIMAL")
    // 'v' variant, 's' string, 'a' array, 'n' number, 'e' entries
    // array (array<struct<key,value:variant>>), 'j' rendered JSON text
    var kind = if (isVariant) 'v' else 's'
    var c: Column = if (isVariant) pv else pv.cast("string")
    // position in the chain: to_entries/keys_unsorted need DOCUMENT
    // key order, which the variant encoding normalizes away (it sorts
    // object keys) — so they compile only as the FIRST function over
    // the whole `.d` payload, where the raw JSON text is the column
    // itself (same contract compileValueStages uses)
    var fi = -1
    val wholeD = p.segs == Seq(Left("d"))
    def entriesOf(raw: Column): Column =
      map_entries(from_json(raw, org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.VariantType)))
    val entryType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.VariantType))))
    def toStr(what: String): Unit = kind match {
      case 'v' => c = strict(t === lit("STRING"), c.cast("string"), what, "string"); kind = 's'
      case 's' => ()
      case _   => throw new IllegalArgumentException(s"$what on non-string chain")
    }
    def toNum(what: String): Unit = kind match {
      case 'v' => c = strict(isNum, c.cast("double"), what, "double"); kind = 'n'
      case 'n' => ()
      case _   => throw new IllegalArgumentException(s"$what on non-number chain")
    }
    for (f <- fns) { fi += 1; f match {
      // jq to_entries: [{key, value}] in DOCUMENT order (why: raw-text
      // only, see `fi` note above). Non-objects raise, as jq does.
      case ToEntries if kind == 'v' && fi == 0 && wholeD =>
        c = when(t.startsWith("OBJECT"), entriesOf(col("d")))
          .otherwise(raise_error(lit(
            "jq compiled tier: to_entries saw a non-object value (jq raises here); run this step via the subprocess tier")).cast(entryType))
        kind = 'e'
      // jq keys_unsorted: document key order — raw-text only, like
      // to_entries
      case KeysFn(false) if kind == 'v' && fi == 0 && wholeD =>
        c = when(t.startsWith("OBJECT"), json_object_keys(col("d")))
          .otherwise(raise_error(lit(
            "jq compiled tier: keys_unsorted saw a non-object value; run this step via the subprocess tier")).cast("array<string>"))
        kind = 'a'
      // jq keys SORTS (by codepoint = Spark's UTF8 binary string
      // order), so the variant's normalized rendering is usable at any
      // chain position and for nested paths
      case KeysFn(true) if kind == 'v' =>
        c = when(t.startsWith("OBJECT"),
            array_sort(json_object_keys(c.cast("string"))))
          .otherwise(raise_error(lit(
            "jq compiled tier: keys saw a non-object value (jq raises here); run this step via the subprocess tier")).cast("array<string>"))
        kind = 'a'
      case Length if kind == 'e' =>
        c = size(c).cast("double"); kind = 'n'
      case MapExpr(Path(Seq(Left("key")))) if kind == 'e' =>
        c = transform(c, e => e.getField("key")); kind = 'a'
      case MapExpr(Select(cond)) if kind == 'e' =>
        entryCond(cond) match {
          case Some(f0) => c = filter(c, e => f0(e))
          case None     => return None
        }
      // with_entries(.value |= tostring/tonumber): the value stays a
      // VARIANT (parse_json of the jq-rendered text) so FromEntries'
      // renderer treats it like any other entry value
      case MapExpr(UpdatePath(Path(Seq(Left("value"))), ToString)) if kind == 'e' =>
        c = transform(c, e => struct(e.getField("key").as("key"),
          entryToString(e.getField("value")).as("value")))
      case MapExpr(UpdatePath(Path(Seq(Left("value"))), ToNumber)) if kind == 'e' =>
        c = transform(c, e => struct(e.getField("key").as("key"),
          entryToNumber(e.getField("value")).as("value")))
      // jq from_entries: object in entry order — map_from_entries +
      // to_json preserve it, and map-valued to_json renders null
      // values (ignoreNullFields only affects structs), so the text
      // matches jq's
      case FromEntries if kind == 'e' =>
        c = to_json(map_from_entries(c)); kind = 'j'
      case SplitFn(sep) =>
        toStr("split")
        c = when(c === lit(""), array().cast("array<string>"))
          .otherwise(split(c, java.util.regex.Pattern.quote(sep), -1))
        kind = 'a'
      case JoinFn(sep) if kind == 'a' =>
        c = array_join(c, sep); kind = 's'
      case Length if kind == 'a' =>
        c = size(c).cast("double"); kind = 'n'
      case Length if kind == 's' =>
        // only reachable when the chain is STATICALLY string (`.n`
        // start or after a string fn, each strict-guarded) — a
        // variant-start `| length` stays on the subprocess tier, since
        // jq's length is polymorphic (array size / object keys / |n|)
        c = length(c).cast("double"); kind = 'n'
      case Fn1("ltrimstr", Some(pre)) =>
        toStr("ltrimstr")
        c = when(c.startsWith(pre), c.substr(lit(pre.length + 1), length(c) - pre.length))
          .otherwise(c)
      case Fn1("rtrimstr", Some(suf)) =>
        toStr("rtrimstr")
        c = when(c.endsWith(suf), c.substr(lit(1), length(c) - suf.length)).otherwise(c)
      case Fn1("ascii_downcase", None) => toStr("ascii_downcase"); c = lower(c)
      case Fn1("ascii_upcase", None)   => toStr("ascii_upcase"); c = upper(c)
      case Fn1("floor", None) => toNum("floor"); c = floor(c).cast("double")
      case Fn1("ceil", None)  => toNum("ceil"); c = ceil(c).cast("double")
      case Fn1("fabs", None)  => toNum("fabs"); c = abs(c)
      case Fn1("sqrt", None) =>
        toNum("sqrt")
        // jq yields NaN for negatives, which its JSON encoder prints as
        // null — not representable through to_json; raise instead
        c = when(c >= 0, sqrt(c)).otherwise(raise_error(concat(
          lit("jq compiled tier: sqrt of a negative renders as jq null; run this step via the subprocess tier"))).cast("double"))
      case Fn1("round", None) =>
        // jq's round is C round (half away from zero) = Spark's HALF_UP
        toNum("round"); c = round(c).cast("double")
      case Fn1("startswith", Some(s)) => toStr("startswith"); c = c.startsWith(s); kind = 'b'
      case Fn1("endswith", Some(s))   => toStr("endswith"); c = c.endsWith(s); kind = 'b'
      case Fn1("test", Some(re)) if safeRegex(re) =>
        // rlike = Java find() (unanchored search), same as jq's test
        toStr("test"); c = c.rlike(jre(re)); kind = 'b'
      case Fn2("test_i", re, _) if safeRegex(re) && re.forall(_ < 128) =>
        // `test(re; "i")`: ASCII-only patterns, where Java's (?i) and
        // Oniguruma's /i fold identically (non-ASCII case folding
        // diverges — subprocess tier)
        toStr("test"); c = c.rlike("(?i)" + jre(re)); kind = 'b'
      case Fn1("not", None) if kind == 'b' => c = !c
      case Fn1("has", Some(k))
          if kind == 'v' && k.nonEmpty && k.forall(ch => ch.isLetterOrDigit || ch == '_') =>
        // present-with-null-value is still `has == true` in jq:
        // variant_get yields a VARIANT null (non-SQL-null) there, SQL
        // NULL only when the key is absent — exactly the distinction
        // needed. Non-objects raise, as jq does.
        c = when(t.startsWith("OBJECT"), try_variant_get(c, s"$$.$k", "variant").isNotNull)
          .otherwise(raise_error(lit(
            "jq compiled tier: has() saw a non-object value (jq raises here); run this step via the subprocess tier")).cast("boolean"))
        kind = 'b'
      case Fn1("reverse", None) if kind == 'a' => c = reverse(c)
      case Fn1("sort", None) if kind == 'a'    => c = array_sort(c)
      case Fn1("unique", None) if kind == 'a'  => c = array_sort(array_distinct(c))
      case Fn1("min", None) if kind == 'a' =>
        // jq: min of [] is null — which the per-event object renderer
        // would DROP (ignoreNullFields); raise instead of diverging
        c = when(size(c) > 0, array_min(c)).otherwise(raise_error(lit(
          "jq compiled tier: min of an empty array is jq null; run this step via the subprocess tier")).cast("string"))
        kind = 's'
      case Fn1("max", None) if kind == 'a' =>
        c = when(size(c) > 0, array_max(c)).otherwise(raise_error(lit(
          "jq compiled tier: max of an empty array is jq null; run this step via the subprocess tier")).cast("string"))
        kind = 's'
      case Fn2("gsub", re, repl) if safeRegex(re) &&
          !java.util.regex.Pattern.compile(re).matcher("").find() =>
        // empty-matchable patterns refuse to compile: jq 1.6's gsub
        // INFINITE-LOOPS on them (verified against the binary), so the
        // compiled tier must not succeed where the reference hangs
        toStr("gsub"); c = regexp_replace(c, jre(re), escapeReplacement(repl))
      case Fn2("sub", re, repl) if safeRegex(re) =>
        // replace-FIRST: wrap as `^(.*?)(re)(.*)$` under DOTALL — the
        // lazy prefix finds the leftmost occurrence, the anchors make
        // the wrapper consume the WHOLE input in exactly one match (so
        // replace-all applies it once, even when re can match empty).
        // The prefix/tail are NAMED groups referenced as ${gp}/${gt}:
        // a numbered "$1" + repl would let a digit-leading replacement
        // fuse into the group reference ("$1" + "2X" reads as group
        // 12). safeRegex rejects `(?`, so re itself cannot contain
        // named groups that would collide.
        toStr("sub")
        c = regexp_replace(c, jre(s"(?s)^(?<gp>.*?)($re)(?<gt>.*)$$"),
          "$" + "{gp}" + escapeReplacement(repl) + "$" + "{gt}")
      case _ => return None
    } }
    // 'v' never transformed and 'e' (entries mid-form) are not values
    if (kind == 'v' || kind == 'e') None else Some((c, kind))
  }

  /** Entry-scope condition for `to_entries | map(select(cond))`: cond
    * over `.key` (string — both sides order lexicographically, exact)
    * and `.value` (variant). Value equality against a literal is
    * EXACT jq: jq `==` across kinds is simply false (and `!=` true),
    * which the kind guard reproduces; value ORDERING compares compile
    * for numeric values only and raise loudly otherwise — jq's
    * cross-type total order is not columnar-expressible, and silence
    * is the one thing the compiled tier must never buy speed with.
    */
  private def entryCond(ast: Ast): Option[Column => Column] = {
    val numKinds = Seq("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT")
    def cmpCol(op: String, l: Column, r: Column): Column = op match {
      case "==" => l === r
      case "!=" => l =!= r
      case "<"  => l < r
      case "<=" => l <= r
      case ">"  => l > r
      case ">=" => l >= r
    }
    def build(a: Ast): Option[Column => Column] = a match {
      case Cmp(op, Path(Seq(Left("key"))), Lit(s: String)) =>
        Some(e => cmpCol(op, e.getField("key"), lit(s)))
      case Cmp(op, Lit(s: String), Path(Seq(Left("key")))) =>
        Some(e => cmpCol(op, lit(s), e.getField("key")))
      case Cmp(op, Path(Seq(Left("value"))), Lit(litV)) =>
        Some { e =>
          val v = e.getField("value")
          val vt = schema_of_variant(v)
          litV match {
            case d: Double =>
              val isNum = vt.isin(numKinds: _*) || vt.startsWith("DECIMAL")
              op match {
                case "==" => isNum && v.cast("double") === lit(d)
                case "!=" => !(isNum && v.cast("double") === lit(d))
                case _ => when(isNum, cmpCol(op, v.cast("double"), lit(d)))
                  .otherwise(raise_error(lit(
                    "jq compiled tier: ordering compare on a non-number entry value (jq totals across kinds); run this step via the subprocess tier")).cast("boolean"))
              }
            case s: String =>
              val isStr = vt === lit("STRING")
              op match {
                case "==" => isStr && v.cast("string") === lit(s)
                case "!=" => !(isStr && v.cast("string") === lit(s))
                case _ => when(isStr, cmpCol(op, v.cast("string"), lit(s)))
                  .otherwise(raise_error(lit(
                    "jq compiled tier: ordering compare on a non-string entry value (jq totals across kinds); run this step via the subprocess tier")).cast("boolean"))
              }
            case null => op match {
              // a present key's value is never SQL-null, so variant
              // null IS jq null here
              case "==" => vt === lit("VOID")
              case "!=" => vt =!= lit("VOID")
              case _    => raise_error(lit(
                "jq compiled tier: ordering compare against null; run this step via the subprocess tier")).cast("boolean")
            }
            case b: Boolean => op match {
              case "==" => vt === lit("BOOLEAN") && v.cast("boolean") === lit(b)
              case "!=" => !(vt === lit("BOOLEAN") && v.cast("boolean") === lit(b))
              case _    => raise_error(lit(
                "jq compiled tier: ordering compare against a boolean; run this step via the subprocess tier")).cast("boolean")
            }
            case _ => raise_error(lit("unreachable entry literal")).cast("boolean")
          }
        }
      case Logic("and", l, r) =>
        for { a0 <- build(l); b0 <- build(r) } yield (e: Column) => a0(e) && b0(e)
      case Logic("or", l, r) =>
        for { a0 <- build(l); b0 <- build(r) } yield (e: Column) => a0(e) || b0(e)
      case _ => None
    }
    build(ast)
  }

  private final case class Ctx(variant: Column, raw: Option[Column])

  /** Value of `ast` with `.` bound to `cur`. */
  private def ctxNum(ast: Ast, cur: Ctx): Option[Column] = ast match {
    case Path(Seq())     => Some(cur.raw.getOrElse(cur.variant).cast("double"))
    case Lit(d: Double)  => Some(lit(d))
    case Arith(op, l, r) =>
      for { lc <- ctxNum(l, cur); rc <- ctxNum(r, cur) } yield op match {
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
        case "%" => lc % rc
      }
    case _ => None
  }

  private def ctxCond(ast: Ast, cur: Ctx): Option[Column] = ast match {
    case Cmp(op, l, r) =>
      // string comparisons need the decoded value, not raw JSON text
      val (lc, rc) = ((l, r) match {
        case (Lit(s: String), _) => (Some(lit(s)), Some(cur.variant.cast("string")))
        case (_, Lit(s: String)) => (Some(cur.variant.cast("string")), Some(lit(s)))
        case _                   => (ctxNum(l, cur), ctxNum(r, cur))
      })
      for { a <- lc; b <- rc } yield op match {
        case "==" => a === b
        case "!=" => a =!= b
        case "<"  => a < b
        case "<=" => a <= b
        case ">"  => a > b
        case ">=" => a >= b
      }
    case Logic("and", l, r) => for { a <- ctxCond(l, cur); b <- ctxCond(r, cur) } yield a && b
    case Logic("or", l, r)  => for { a <- ctxCond(l, cur); b <- ctxCond(r, cur) } yield a || b
    case _ => None
  }

  private def compileValueStages(stages: Seq[Ast]): Option[PerEventValue] = {
    var cur: Option[Ctx] = None
    val filters = Seq.newBuilder[Column]
    for (stage <- stages) stage match {
      case Path(Seq()) => () // `.` — no-op over the current value
      case p: Path if cur.isEmpty =>
        val raw = p match {
          // `.d`: the payload column IS the value's JSON text already
          case Path(Seq(Left("d"))) => Some(col("d"))
          case _                    => None
        }
        cur = eventValue(p).map(Ctx(_, raw))
        if (cur.isEmpty) return None
      case Select(c) =>
        cur match {
          case Some(v) => ctxCond(c, v) match {
            case Some(f) => filters += f
            case None    => return None
          }
          case None => boolCond(c) match {
            case Some(f) => filters += f
            case None    => return None
          }
        }
      case IfElse(c, Empty, Path(Seq())) =>
        val v = cur.getOrElse(return None)
        ctxCond(c, v) match {
          case Some(f) => filters += !f
          case None    => return None
        }
      case IfElse(c, Path(Seq()), Empty) =>
        val v = cur.getOrElse(return None)
        ctxCond(c, v) match {
          case Some(f) => filters += f
          case None    => return None
        }
      case _ => return None
    }
    cur.map {
      case Ctx(_, Some(raw)) =>
        // raw pass-through: the payload text is canonical compact JSON
        // (the engine's own renderers produce it), identical to jq's
        // re-rendering
        PerEventValue(filters.result().reduceOption(_ && _),
          coalesce(raw, lit("null")))
      case Ctx(v, None) =>
        // render the variant back to its exact JSON text (to_json omits
        // null struct fields, so null values need the explicit literal)
        val asJson = to_json(struct(v.as("v")))
        PerEventValue(filters.result().reduceOption(_ && _),
          when(v.isNull, lit("null"))
            .otherwise(asJson.substr(lit(6), length(asJson) - 6)))
    }
  }

  private def compilePerEvent(stages: Seq[Ast]): Option[Compiled] = {
    val (selects, rest) = stages.partition(_.isInstanceOf[Select])
    val filters = selects.map { case Select(c) => boolCond(c) }
    if (filters.exists(_.isEmpty)) return None
    val filter = filters.flatten.reduceOption(_ && _)
    rest match {
      case Seq() | Seq(Path(Seq())) =>
        // identity projection: same n, same payload
        Some(CompiledPerEvent(PerEvent(filter, col("n"),
          coalesce(col("d"), lit("null")))))
      case Seq(o: ObjCons) =>
        // event envelope semantics: n, d, and a literal `t: .t` trace
        // passthrough are meaningful — the reference's event schema
        // rejects other keys, so refuse to compile objects with them
        // (the subprocess tier + strict parsing is then authoritative)
        if (!o.fields.map(_._1).forall(Set("n", "d", "t"))) return None
        // `t` compiles ONLY as the verbatim passthrough (a computed
        // trace is the subprocess tier's business)
        val tOk = o.fields.collectFirst { case ("t", v) => v } match {
          case None                          => Some(false)
          case Some(Path(Seq(Left("t"))))    => Some(true)
          case Some(_)                       => None
        }
        if (tOk.isEmpty) return None
        val nExpr = o.fields.collectFirst { case ("n", v) => valueExpr(v) }.flatten
        val dExpr = o.fields.collectFirst { case ("d", v) => jsonValueExpr(v) }.flatten
        if (nExpr.isEmpty || (o.fields.exists(_._1 == "d") && dExpr.isEmpty)) None
        else Some(CompiledPerEvent(PerEvent(filter, nExpr.get.cast("string"),
          dExpr.getOrElse(lit("null")), keepTrace = tOk.get)))
      case _ => None
    }
  }

  /** Vector scope: aggregates over the grouped events. */
  private def compilePerVector(o: ObjCons): Option[Compiled] = {
    val nExpr = o.fields.collectFirst { case ("n", Lit(s: String)) => lit(s) }
    if (nExpr.isEmpty) return None
    o.fields.filterNot(_._1 == "n") match {
      // group_by as the WHOLE d payload (its builder renders JSON text
      // directly; nested inside an object it would double-escape, so
      // that shape stays on the subprocess tier)
      case Seq(("d", g @ PipeSeq(Seq(GroupByKey(_), MapExpr(_: ObjCons))))) =>
        groupByAgg(g).map(b =>
          CompiledPerVector(PerVector(nExpr.get, Seq("d" -> b))))
      case Seq(("d", u @ PipeSeq(Seq(UniqueByKey(_), MapExpr(_: ObjCons))))) =>
        uniqueByAgg(u).map(b =>
          CompiledPerVector(PerVector(nExpr.get, Seq("d" -> b))))
      case Seq(("d", sb @ PipeSeq(Seq(SortByKey(_), MapExpr(_: ObjCons))))) =>
        sortByAgg(sb).map(b =>
          CompiledPerVector(PerVector(nExpr.get, Seq("d" -> b))))
      // `map(<path>) | .[from:to]` as the whole d payload: arrival-
      // ordered values, sliced, rendered as JSON array text (raw-text
      // position, like the group_by builders — nested in an object it
      // would double-escape, so that shape stays on the subprocess
      // tier). Spark's slice clamps out-of-range exactly like jq's.
      case Seq(("d", PipeSeq(Seq(MapExpr(p: Path), Slice(a, b))))) =>
        eventValue(p).map { c =>
          val builder = (ord: Column) =>
            to_json(slice(transform(
              array_sort(collect_list(struct(ord.as("__o"), c.as("__v"))), arrivalCmp),
              x => x.getField("__v")), a + 1, b - a))
          CompiledPerVector(PerVector(nExpr.get, Seq("d" -> builder)))
        }
      // `map(<path>) | @csv` as the whole d payload: one CSV line of
      // the arrival-ordered cells, emitted as a JSON STRING (the
      // struct-strip quoting, full escaping)
      case Seq(("d", PipeSeq(Seq(MapExpr(p: Path), FormatCsv)))) =>
        eventValue(p).map { c =>
          val isN = p.segs == Seq(Left("n"))
          val builder = (ord: Column) => {
            val items = transform(array_sort(
              collect_list(struct(ord.as("__o"), c.as("__v"))), arrivalCmp),
              x => x.getField("__v"))
            val line = array_join(transform(items,
              v => if (isN) concat(lit("\""),
                regexp_replace(v.cast("string"), "\"", "\"\""), lit("\""))
              else csvCell(v)), ",")
            jsonQuoteCol(line)
          }
          CompiledPerVector(PerVector(nExpr.get, Seq("d" -> builder)))
        }
      case flds =>
        val aggs = flds.map { case (k, v) => vectorAgg(v).map(k -> _) }
        if (aggs.exists(_.isEmpty)) None
        else Some(CompiledPerVector(PerVector(nExpr.get, aggs.flatten)))
    }
  }

  private def vectorAgg(ast: Ast): Option[Column => Column] = ast match {
    case Length => Some(_ => count(lit(1)).cast("double"))
    case r: Reduce => reduceAgg(r)
    case PipeSeq(Seq(MapExpr(p: Path), Add)) =>
      eventValue(p).map(c => (_: Column) => sum(c.cast("double")))
    // `map(<cond>) | any` / `| all`: jq's boolean fold over the mapped
    // conditions. A per-element NULL (an absent-path compare) counts
    // false — exactly how select() treats the same condition (SQL
    // filter drops null = jq's falsy). Vectors are non-empty by
    // construction (no rows → no group), so jq's empty-array defaults
    // are unreachable; the outer coalesce only guards the SQL
    // aggregate's null on impossible all-null input.
    case PipeSeq(Seq(MapExpr(cond), AnyAll(isAll))) =>
      boolCond(cond).map { c0 =>
        val c = coalesce(c0, lit(false))
        (_: Column) =>
          if (isAll) coalesce(bool_and(c), lit(true))
          else coalesce(bool_or(c), lit(false))
      }
    // `map(<path>) | join(sep)`: arrival-ordered string concatenation
    case PipeSeq(Seq(MapExpr(p: Path), JoinFn(sep))) =>
      eventValue(p).map { c => (ord: Column) =>
        array_join(transform(
          array_sort(collect_list(struct(ord.as("__o"), c.cast("string").as("__v")))),
          x => x.getField("__v")), sep)
      }
    // `unique_by(<path>) | length`: distinct key count — the struct
    // wrapper keeps null keys (collect_list drops bare nulls; jq's
    // null-key group counts)
    case PipeSeq(Seq(UniqueByKey(kp), Length)) =>
      eventValue(kp).map { c => (_: Column) =>
        size(array_distinct(collect_list(struct(c.cast("string").as("__k"))))).cast("double")
      }
    case First(p) =>
      eventValue(p).map(c => (ord: Column) => min_by(c, ord))
    // jq first(.[] | p) / last(.[] | p): the first/last event's value
    // in arrival order — one min_by/max_by, no collect of the vector
    case FirstLast(p, isLast) =>
      eventValue(p).map(c => (ord: Column) =>
        if (isLast) max_by(c, ord) else min_by(c, ord))
    // `(min_by(<key>) | <path>)` / `(max_by(<key>) | <path>)` as an
    // object field: jq picks the FIRST minimal / LAST maximal element
    // (stable sort + .[0]/.[-1], verified vs jq 1.6), then the path
    // reads from that element. Keys compare as strings — the same
    // envelope (and caveat) as group_by/unique_by.
    case PipeSeq(Seq(MinMaxByKey(kp, isMax), p: Path)) =>
      for { k <- eventValue(kp); v <- eventValue(p) } yield (ord: Column) => {
        val entry = struct(k.cast("string").as("__k"), ord.as("__o"), v.as("__v"))
        val items = array_sort(collect_list(entry), keyArrivalCmp)
        element_at(items, if (isMax) -1 else 1).getField("__v")
      }
    case Lit(s: String) => Some(_ => first(lit(s)))
    case Lit(d: Double) => Some(_ => first(lit(d)))
    case ObjCons(fields) =>
      val sub = fields.map { case (k, v) => vectorAgg(v).map(f => (ord: Column) => f(ord).as(k)) }
      if (sub.exists(_.isEmpty)) None
      else Some((ord: Column) =>
        to_json(struct(sub.flatten.map(_(ord)): _*)).asInstanceOf[Column])
    case _ => None
  }

  /** `reduce .[] as $x (init; . op expr($x))` over the vector — the
    * reference's "moving aggregates" idiom (its README aggregates
    * window vectors with jq reduce) — as ONE aggregate expression:
    * the per-event operand evaluates per row, collect in arrival
    * order, then a LEFT FOLD from the literal init — the exact FP
    * sequence jq runs, unlike a re-associating `sum`. Sources `.[]`
    * (event-rooted `$x.d.v` operands) and `.[]<path>` (value-rooted
    * `$x`) both bind.
    *
    * Op coverage is semantics-gated: `+` treats a null operand as the
    * identity (jq: "null can be added to any value"), exactly the
    * missing-field case; `-`/`*` RAISE on null where jq raises;
    * `/`/`%` stay on the subprocess tier (jq errors on zero
    * divisors, Spark doubles yield ±Inf — not reproducible without a
    * per-element guard that would outweigh the fold). A non-numeric
    * present value raises loudly, naming the subprocess tier.
    */
  private def reduceAgg(r: Reduce): Option[Column => Column] = {
    val root: Option[Seq[Either[String, Int]]] = r.src match {
      case IterateAll                           => Some(Seq.empty)
      case PipeSeq(Seq(IterateAll, Path(segs))) => Some(segs)
      case _                                    => None
    }
    val initV = r.init match { case Lit(d: Double) => Some(d); case _ => None }
    def applyOp(op: String, a: Column, b: Column): Column = op match {
      case "+" => a + b
      case "-" => a - b
      case "*" => a * b
    }
    (root, initV, r.upd) match {
      case (Some(rt), Some(init), Arith(op, Path(Seq()), rhs))
          if op == "+" || op == "-" || op == "*" =>
        def operand(ast: Ast): Option[Column] = ast match {
          case VarPath(nm, segs) if nm == r.varName =>
            eventValue(Path(rt ++ segs)).map { v =>
              val t = schema_of_variant(v)
              val isNum = t.isin("BIGINT", "DOUBLE", "FLOAT", "INT",
                "SMALLINT", "TINYINT") || t.startsWith("DECIMAL")
              when(v.isNull || t === lit("VOID"), lit(null).cast("double"))
                .when(isNum, v.cast("double"))
                .otherwise(raise_error(lit(
                  "jq compiled tier: reduce saw a non-number operand (jq raises here); run this step via the subprocess tier")).cast("double"))
            }
          case Lit(d: Double)    => Some(lit(d))
          case Arith(o2, l, rr) if o2 == "+" || o2 == "-" || o2 == "*" =>
            for { a <- operand(l); b <- operand(rr) } yield applyOp(o2, a, b)
          case _ => None
        }
        operand(rhs).map { vc => (ord: Column) =>
          val items = transform(
            array_sort(collect_list(struct(ord.as("__o"), vc.as("__v")))),
            x => x.getField("__v"))
          aggregate(items, lit(init), (acc, x) =>
            if (op == "+") acc + coalesce(x, lit(0.0)) // jq null + identity
            else applyOp(op, acc, when(x.isNull, raise_error(lit(
              "jq compiled tier: reduce " + op + " saw null (jq raises here); run this step via the subprocess tier")).cast("double")).otherwise(x)))
        }
      case _ => None
    }
  }

  /** `group_by(<key>) | map({...})` over the vector — the count-by /
    * sum-by idiom — as ONE aggregate expression: collect (key, order,
    * sources) structs, sort (jq group_by sorts by key; the order
    * tiebreak reproduces its stable within-group arrival order), then
    * per distinct key emit the group object with higher-order
    * functions. Group fields supported: the key itself (`.[0]<key>`),
    * `length`, and `map(<path>) | add` — whose per-group left fold adds
    * in arrival order, the exact FP sequence jq's `add` runs. Keys
    * compare as strings (the realistic category/name key; jq's
    * cross-type total order is the subprocess tier's) — so numeric
    * keys group by their JSON rendering, splitting variants jq would
    * merge (`1` vs `1.0`); a null/missing key is a real group (see
    * below), matching jq.
    */
  private def groupByAgg(ast: Ast): Option[Column => Column] = ast match {
    case PipeSeq(Seq(GroupByKey(kp), MapExpr(ObjCons(fields)))) =>
      val keyC = eventValue(kp) match {
        case Some(c) => c.cast("string")
        case None    => return None
      }
      // (name, None = key | Some(Left idx) = length | Some(Right idx) = sum src)
      val srcs = Seq.newBuilder[Column]
      var nSrc = 0
      val specs: Seq[(String, Option[Int], Boolean)] = fields.map {
        case (k, First(p)) if p.segs == kp.segs => (k, None, false)
        case (k, Length) => (k, None, true)
        case (k, PipeSeq(Seq(MapExpr(p: Path), Add))) =>
          eventValue(p) match {
            case Some(c) =>
              srcs += c.cast("double"); nSrc += 1
              (k, Some(nSrc - 1), false)
            case None => return None
          }
        case _ => return None
      }
      val srcCols = srcs.result()
      Some { (ord: Column) =>
        val entry = struct(
          (keyC.as("__k") +: ord.as("__o") +:
            srcCols.zipWithIndex.map { case (c, i) => c.as(s"__v$i") }): _*)
        val items = array_sort(collect_list(entry))
        val keys = array_distinct(transform(items, x => x.getField("__k")))
        // to_json: this form is the step's whole `d` payload (callers
        // render d as JSON text); group_by nested INSIDE an object
        // construction stays on the subprocess tier.
        // Null-safe group equality (<=>): a missing/null key field is a
        // legal jq group (it sorts first — matching Spark's nulls-first
        // struct ordering in array_sort above); plain === would match
        // nothing and emit a phantom empty group. ignoreNullFields=false
        // renders that group's key as jq does (`"k":null`); the other
        // compiled group fields (length, sum with a 0.0 init) are never
        // null, so the option changes nothing else.
        to_json(transform(keys, k => {
          val grp = filter(items, x => x.getField("__k") <=> k)
          struct(specs.map {
            case (name, None, false)   => k.as(name)
            case (name, None, true)    => size(grp).as(name)
            case (name, Some(i), _)    =>
              aggregate(grp, lit(0.0),
                (acc, x) => acc + x.getField(s"__v$i")).as(name)
          }: _*)
        }), Map("ignoreNullFields" -> "false"))
      }
    case _ => None
  }

  /** `unique_by(<key>) | map({...})` over the vector as ONE aggregate:
    * jq's unique_by sorts by key (stably) and keeps each key's FIRST
    * element, so the representative is the earliest-arrival event per
    * key, emitted in key order (null key first, like group_by). Map
    * fields must be plain paths over the representative event; values
    * keep their original types (variant) — only the GROUPING compares
    * keys as strings, with the same numeric-variant caveat as
    * [[groupByAgg]].
    */
  /** Comparator for entry structs carrying (__k string key, __o
    * arrival order, __v* values): (key nulls-first, arrival) — jq's
    * stable by-key order. Explicit because the value fields may be
    * VARIANT, which default struct ordering cannot compare.
    */
  /** Arrival-order comparator on the `__o` field alone — for entry
    * structs carrying VARIANT values, which the default struct
    * ordering cannot compare.
    */
  private val arrivalCmp: (Column, Column) => Column = (l, r) =>
    when(l.getField("__o") < r.getField("__o"), -1)
      .when(l.getField("__o") > r.getField("__o"), 1).otherwise(0)

  private val keyArrivalCmp: (Column, Column) => Column = (l, r) => {
    val lk = l.getField("__k")
    val rk = r.getField("__k")
    when(lk <=> rk,
      when(l.getField("__o") < r.getField("__o"), -1)
        .when(l.getField("__o") > r.getField("__o"), 1).otherwise(0))
      .when(lk.isNull, -1)
      .when(rk.isNull, 1)
      .when(lk < rk, -1)
      .otherwise(1)
  }

  /** `sort_by(<key>) | map({...})` over the vector as ONE aggregate:
    * jq's sort_by is a STABLE sort by key (null key first), so entries
    * order by (key, arrival) and — unlike unique_by's per-key
    * representative — EVERY element is emitted. Map fields must be
    * plain paths over the element; values keep their original types
    * (variant). Keys compare as strings, the same envelope (and
    * numeric-rendering caveat) as [[groupByAgg]].
    */
  private def sortByAgg(ast: Ast): Option[Column => Column] = ast match {
    case PipeSeq(Seq(SortByKey(kp), MapExpr(ObjCons(fields)))) =>
      val keyC = eventValue(kp) match {
        case Some(c) => c.cast("string")
        case None    => return None
      }
      val srcs = fields.map {
        case (k, p: Path) => eventValue(p).map(k -> _)
        case _            => None
      }
      if (srcs.exists(_.isEmpty)) return None
      val named = srcs.flatten
      Some { (ord: Column) =>
        val entry = struct(
          (keyC.as("__k") +: ord.as("__o") +:
            named.zipWithIndex.map { case ((_, c), i) => c.as(s"__v$i") }): _*)
        val items = array_sort(collect_list(entry), keyArrivalCmp)
        to_json(transform(items, x =>
          struct(named.zipWithIndex.map { case ((name, _), i) =>
            x.getField(s"__v$i").as(name)
          }: _*)), Map("ignoreNullFields" -> "false"))
      }
    case _ => None
  }

  private def uniqueByAgg(ast: Ast): Option[Column => Column] = ast match {
    case PipeSeq(Seq(UniqueByKey(kp), MapExpr(ObjCons(fields)))) =>
      val keyC = eventValue(kp) match {
        case Some(c) => c.cast("string")
        case None    => return None
      }
      val srcs = fields.map {
        case (k, p: Path) => eventValue(p).map(k -> _)
        case _            => None
      }
      if (srcs.exists(_.isEmpty)) return None
      val named = srcs.flatten
      Some { (ord: Column) =>
        val entry = struct(
          (keyC.as("__k") +: ord.as("__o") +:
            named.zipWithIndex.map { case ((_, c), i) => c.as(s"__v$i") }): _*)
        // comparator sort: the value fields may be VARIANT (unorderable),
        // so order by (__k nulls-first, __o) explicitly
        val items = array_sort(collect_list(entry), keyArrivalCmp)
        val keys = array_distinct(transform(items, x => x.getField("__k")))
        to_json(transform(keys, k => {
          val rep = element_at(filter(items, x => x.getField("__k") <=> k), 1)
          struct(named.zipWithIndex.map { case ((name, _), i) =>
            rep.getField(s"__v$i").as(name)
          }: _*)
        }), Map("ignoreNullFields" -> "false"))
      }
    case _ => None
  }
}
