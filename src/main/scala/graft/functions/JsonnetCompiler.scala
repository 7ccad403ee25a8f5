package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiled tier for jsonnet expressions (SURVEY.md §2.4 #13): the
  * `function(events) ...` object-construction forms the reference's
  * README and examples use (reference README.md:1126-1138,
  * examples/exposition/pipeline.yaml) lower to the same native Column
  * shapes as [[JqCompiler]] — no helper binary, codegen'd. Anything
  * outside the subset falls back to the `stream-jsonnet` subprocess
  * (reference stream-jsonnet/main.go:40-70), which stays gated on
  * `GRAFT_JSONNET_BIN`.
  *
  * Supported surface (the expression receives the event vector as the
  * `events` top-level argument):
  *   - `function(events) events` — identity (the reference's parser
  *     flattens array outputs back into individual events,
  *     src/event.ts:276-297)
  *   - `function(events) {k: <expr>, ...}` — one object per vector,
  *     parsed as a replacement event; `n` must be a string literal
  *   - value exprs: string/number/bool literals,
  *     `std.length(events)`, `events[0]` paths (`.n`, `.d.x.y`,
  *     `.t[i].f`), `std.toString(e)`, arithmetic `+ - * / %`
  *     (`+` is string concatenation when either side is a string,
  *     like jsonnet), nested object construction
  *   - `local` bindings (values AND one-or-more-arg function
  *     definitions, prelude-style) — inlined by substitution, which is
  *     exact for this pure subset; call sites may pass
  *     `prelude + "\n" + expr` so `jsonnet-prelude` definitions
  *     compile too
  *   - `std.join(sep, [..])`, `std.join(sep, std.map(function(e)
  *     <string-expr>, events))` (arrival-ordered), `std.format` with
  *     `%s`/`%d`/`%%`, `std.length(<string>)` / `std.length(event.t)`,
  *     and the last-trace idiom `event.t[std.length(event.t) - 1].f`
  *   - `if c then a else b`, comparisons `== != < <= > >=` (strings
  *     when either side is string-kinded, else numeric), `&& || !` —
  *     branches align string > boolean > numeric so both engines see
  *     one type
  */
object JsonnetCompiler {

  // ---- AST ----
  private sealed trait JAst
  private case object JEvents extends JAst
  private case class JLit(v: Any) extends JAst
  private case class JPath(idx: Int, segs: Seq[Either[String, Int]]) extends JAst
  private case object JLen extends JAst
  private case class JStr(e: JAst) extends JAst
  private case class JBin(op: String, l: JAst, r: JAst) extends JAst
  private case class JObj(fields: Seq[(String, JAst)]) extends JAst
  private case class JVar(name: String) extends JAst                  // unresolved binding ref
  private case class JEvtPath(v: String, segs: Seq[Either[String, Int]]) extends JAst
  private case class JMap(param: String, body: JAst) extends JAst     // std.map(function(p) body, events)
  /** `std.foldl(function(acc, e) <acc op operand(e)>, events, init)` —
    * the moving-aggregate fold (jsonnet's counterpart of jq `reduce`).
    */
  private case class JFoldl(acc: String, param: String, body: JAst, init: JAst) extends JAst
  private case class JJoin(sep: String, arr: JAst) extends JAst       // std.join(sepLit, arr)
  private case class JArr(items: Seq[JAst]) extends JAst              // [a, b, ...]
  private case class JFormat(fmt: String, args: Seq[JAst]) extends JAst // std.format(fmtLit, [args])
  private case class JLenOf(e: JAst) extends JAst                     // std.length over strings / event arrays
  private case class JIf(c: JAst, t: JAst, e: JAst) extends JAst      // if c then t else e
  private case class JNot(e: JAst) extends JAst                       // !e

  def tryCompile(expr: String): Option[JqCompiler.Compiled] =
    try {
      val body = new Parser(expr).parseFunction()
      compileTop(body)
    } catch { case _: Exception => None }

  /** Streaming face of the same subset: the per-vector object form
    * lowered to Columns over one CLOSED vector row (`events:
    * array<struct<n,d,t,ts,seq>>` in arrival order — a
    * [[graft.streaming.SVector]]). The stream compiler applies these
    * as a projection on the window operator's output, so per-vector
    * jsonnet runs binary-free in streaming without stacking a second
    * stateful aggregation after `flatMapGroupsWithState`.
    */
  final case class VectorColumns(outName: Column, payloadJson: Column)

  def tryCompileVector(expr: String): Option[VectorColumns] =
    try {
      new Parser(expr).parseFunction() match {
        case o: JObj =>
          val nExpr = o.fields.collectFirst { case ("n", JLit(s: String)) => lit(s) }
          val rest = o.fields.filterNot(_._1 == "n")
          val vals = rest.map { case (k, v) => vecValue(v).map(k -> _) }
          if (nExpr.isEmpty || vals.exists(_.isEmpty)) None
          else {
            // same payload convention as the batch tier: a lone `d`
            // field IS the payload; otherwise the fields form an object
            val payload = rest.map(_._1) match {
              case Seq("d") => vals.head.get._2.cast("string")
              case _ => to_json(struct(vals.flatten.map { case (k, c) => c.as(k) }: _*))
            }
            Some(VectorColumns(nExpr.get, payload))
          }
        case _ => None
      }
    } catch { case _: Exception => None }

  // ---- parser (recursive descent over the subset grammar) ----
  private final class Parser(src: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < src.length && src(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < src.length) src(pos) else ' '
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

    // local bindings in scope: name -> (params, body). Value bindings
    // have no params. Resolution is inline substitution at parse time —
    // exact for this pure subset (no side effects, no laziness to
    // observe).
    private val env = scala.collection.mutable.Map.empty[String, (Seq[String], JAst)]
    // function parameters currently in scope (treated as event vars)
    private var params: Set[String] = Set.empty

    def parseFunction(): JAst = {
      parseLocals()
      require(tryEat("function"), "expression must be a function")
      eat('('); require(ident() == "events", "single argument must be 'events'"); eat(')')
      val body = parseExpr()
      ws()
      require(pos >= src.length, s"trailing input at $pos: '${src.drop(pos)}'")
      body
    }

    /** Zero or more `local name(p1, ..)? = expr;` definitions. */
    private def parseLocals(): Unit = {
      ws()
      while (src.startsWith("local", pos) &&
             (pos + 5 >= src.length || !src(pos + 5).isLetterOrDigit)) {
        pos += 5
        val name = ident()
        ws()
        val ps =
          if (peek == '(') {
            pos += 1
            val b = Seq.newBuilder[String]
            b += ident()
            ws()
            while (peek == ',') { pos += 1; b += ident(); ws() }
            eat(')')
            b.result()
          } else Seq.empty
        eat('=')
        val saved = params
        params = params ++ ps
        val body = parseIfLevel()
        params = saved
        eat(';')
        env(name) = (ps, body)
        ws()
      }
    }

    /** Expression with optional leading locals (jsonnet allows them in
      * any expression position; the subset takes them here and at the
      * top).
      */
    private def parseExpr(): JAst = { parseLocals(); parseIfLevel() }

    /** Keyword match with a word boundary (`if` must not eat `iffy`). */
    private def tryKeyword(s: String): Boolean = {
      ws()
      if (src.startsWith(s, pos) &&
          (pos + s.length >= src.length ||
           !(src(pos + s.length).isLetterOrDigit || src(pos + s.length) == '_'))) {
        pos += s.length; true
      } else false
    }

    // jsonnet precedence, tightest last: if < || < && < == != < < <= > >= < + -
    private def parseIfLevel(): JAst =
      if (tryKeyword("if")) {
        val c = parseOr()
        require(tryKeyword("then"), s"expected 'then' at $pos")
        val t = parseExpr()
        require(tryKeyword("else"), s"expected 'else' at $pos (subset requires else)")
        JIf(c, t, parseExpr())
      } else parseOr()

    private def parseOr(): JAst = {
      var l = parseAnd()
      while (tryEat("||")) l = JBin("||", l, parseAnd())
      l
    }
    private def parseAnd(): JAst = {
      var l = parseEquality()
      while (tryEat("&&")) l = JBin("&&", l, parseEquality())
      l
    }
    private def parseEquality(): JAst = {
      var l = parseRelational()
      var done = false
      while (!done) {
        if (tryEat("==")) l = JBin("==", l, parseRelational())
        else if (tryEat("!=")) l = JBin("!=", l, parseRelational())
        else done = true
      }
      l
    }
    private def parseRelational(): JAst = {
      var l = parseAdditive()
      var done = false
      while (!done) {
        if (tryEat("<=")) l = JBin("<=", l, parseAdditive())
        else if (tryEat(">=")) l = JBin(">=", l, parseAdditive())
        else if (tryEat("<")) l = JBin("<", l, parseAdditive())
        else if (tryEat(">")) l = JBin(">", l, parseAdditive())
        else done = true
      }
      l
    }

    private def parseAdditive(): JAst = {
      var l = parseMultiplicative()
      ws()
      while (peek == '+' || peek == '-') {
        val op = peek.toString; pos += 1
        l = JBin(op, l, parseMultiplicative())
        ws()
      }
      l
    }
    private def parseMultiplicative(): JAst = {
      var l = parseAtom()
      ws()
      while (peek == '*' || peek == '/' || peek == '%') {
        val op = peek.toString; pos += 1
        l = JBin(op, l, parseAtom())
        ws()
      }
      l
    }

    private def parseAtom(): JAst = {
      ws()
      if (tryEat("std.length(")) {
        val e = parseExpr(); eat(')')
        e match { case JEvents => JLen; case other => JLenOf(other) }
      }
      else if (tryEat("std.toString(")) { val e = parseExpr(); eat(')'); JStr(e) }
      else if (tryEat("std.join(")) {
        ws()
        val sep = parseString()
        eat(','); val arr = parseExpr(); eat(')')
        JJoin(sep, arr)
      }
      else if (tryEat("std.map(")) {
        require(tryEat("function"), "std.map needs an inline function")
        eat('('); val p = ident(); eat(')')
        val saved = params
        params = params + p
        val body = parseExpr()
        params = saved
        eat(',')
        val target = parseExpr()
        require(target == JEvents, "std.map target must be `events`")
        eat(')')
        JMap(p, body)
      }
      else if (tryEat("std.foldl(")) {
        require(tryEat("function"), "std.foldl needs an inline function")
        eat('('); val accP = ident(); ws(); eat(','); ws(); val evP = ident(); eat(')')
        val saved = params
        params = params + accP + evP // acc resolves structurally in aggValue
        val body = parseExpr()
        params = saved
        ws(); eat(',')
        val target = parseExpr()
        require(target == JEvents, "std.foldl target must be `events`")
        ws(); eat(',')
        val init = parseExpr()
        ws(); eat(')')
        JFoldl(accP, evP, body, init)
      }
      else if (tryEat("std.format(")) {
        ws()
        val fmt = parseString()
        eat(','); val args = parseExpr(); eat(')')
        args match {
          case a: JArr => JFormat(fmt, a.items)
          case other   => JFormat(fmt, Seq(other))
        }
      }
      else if (tryEat("events")) parseEventsRef()
      else if (peek == '{') parseObj()
      else if (peek == '[') {
        pos += 1
        val items = Seq.newBuilder[JAst]
        ws()
        if (peek != ']') {
          items += parseExpr()
          ws()
          while (peek == ',') { pos += 1; items += parseExpr(); ws() }
        }
        eat(']')
        JArr(items.result())
      }
      else if (peek == '"') JLit(parseString())
      else if (tryEat("true")) JLit(true)
      else if (tryEat("false")) JLit(false)
      else if (tryEat("null")) JLit(null)
      else if (peek == '(') { eat('('); val e = parseExpr(); eat(')'); e }
      else if (peek == '!' && (pos + 1 >= src.length || src(pos + 1) != '=')) {
        pos += 1; JNot(parseAtom())
      }
      else if (peek.isLetter || peek == '_') parseIdentRef()
      else parseNumber()
    }

    /** A bare identifier: an in-scope function parameter (event var,
      * optionally followed by a path) or a `local` binding (value
      * inline, or a call with argument substitution).
      */
    private def parseIdentRef(): JAst = {
      val name = ident()
      if (params.contains(name)) JEvtPath(name, parseSegs(name))
      else env.get(name) match {
        case Some((Seq(), body)) => body // value binding: already-parsed AST
        case Some((ps, body)) =>
          eat('(')
          val args = Seq.newBuilder[JAst]
          args += parseExpr()
          ws()
          while (peek == ',') { pos += 1; args += parseExpr(); ws() }
          eat(')')
          val a = args.result()
          require(a.length == ps.length, s"$name expects ${ps.length} args, got ${a.length}")
          subst(body, ps.zip(a).toMap)
        case None =>
          throw new IllegalArgumentException(s"unknown identifier '$name' at $pos")
      }
    }

    /** Path segments after an event variable: `.f`, `[i]`, and the
      * last-element idiom `x.t[std.length(x.t) - 1]` (encoded as index
      * -1, resolved by `element_at(col, -1)`).
      */
    private def parseSegs(v: String): Seq[Either[String, Int]] =
      parseSegsWith(segs => JEvtPath(v, segs))

    /** Shared segment loop: `.f`, `[i]`, and the last-element idiom
      * `base.path[std.length(base.path) - 1]` (encoded as index -1);
      * `mk` rebuilds the base reference at the current prefix so the
      * idiom's inner length argument can be compared structurally.
      */
    private def parseSegsWith(mk: Seq[Either[String, Int]] => JAst): Seq[Either[String, Int]] = {
      val segs = scala.collection.mutable.ArrayBuffer[Either[String, Int]]()
      var done = false
      while (!done) {
        if (peek == '.' && pos + 1 < src.length &&
            (src(pos + 1).isLetter || src(pos + 1) == '_')) {
          pos += 1; segs += Left(ident())
        } else if (peek == '[') {
          pos += 1; ws()
          parseExpr() match {
            case JLit(d: Double) => segs += Right(d.toInt)
            case JBin("-", JLenOf(inner), JLit(one: Double))
              if one == 1.0 && inner == mk(segs.toSeq) =>
              segs += Right(-1) // last element
            case other =>
              throw new IllegalArgumentException(s"unsupported dynamic index $other")
          }
          eat(']')
        } else done = true
      }
      segs.toSeq
    }

    /** Substitute function parameters with argument ASTs. */
    private def subst(ast: JAst, m: Map[String, JAst]): JAst = ast match {
      case JEvtPath(v, segs) if m.contains(v) => m(v) match {
        case JEvtPath(v2, s2) => JEvtPath(v2, s2 ++ segs)
        case JPath(i, s2)     => JPath(i, s2 ++ segs)
        case other if segs.isEmpty => other
        case other =>
          throw new IllegalArgumentException(s"cannot take path $segs of $other")
      }
      case JVar(n) if m.contains(n) => m(n)
      case JStr(e)        => JStr(subst(e, m))
      case JLenOf(e)      => JLenOf(subst(e, m))
      case JBin(op, l, r) => JBin(op, subst(l, m), subst(r, m))
      case JObj(fs)       => JObj(fs.map { case (k, x) => k -> subst(x, m) })
      case JArr(items)    => JArr(items.map(subst(_, m)))
      case JJoin(sep, a)  => JJoin(sep, subst(a, m))
      case JFormat(f, as_) => JFormat(f, as_.map(subst(_, m)))
      case JMap(p, b)     => JMap(p, subst(b, m - p)) // shadowing
      case JFoldl(a, p, b, i) => JFoldl(a, p, subst(b, m - a - p), subst(i, m))
      case other          => other
    }

    /** After `events`: bare (the whole vector) or `[i]` + path segs. */
    private def parseEventsRef(): JAst = {
      ws()
      if (peek != '[') return JEvents
      eat('[')
      val idx = parseNumber().asInstanceOf[JLit].v.asInstanceOf[Double].toInt
      eat(']')
      JPath(idx, parseSegsWith(segs => JPath(idx, segs)))
    }

    private def parseObj(): JAst = {
      eat('{')
      val fields = Seq.newBuilder[(String, JAst)]
      var more = true
      while (more) {
        ws()
        val k = if (peek == '"') parseString() else ident()
        eat(':')
        fields += (k -> parseExpr())
        ws()
        more = peek == ','
        if (more) pos += 1
      }
      eat('}')
      JObj(fields.result())
    }

    private def parseString(): String = {
      eat('"')
      val sb = new StringBuilder
      while (pos < src.length && src(pos) != '"') {
        if (src(pos) == '\\') {
          pos += 1
          require(pos < src.length, "unterminated escape")
          val decoded = src(pos) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '"' => '"'; case '\\' => '\\'; case '/' => '/'
            case 'u' =>
              require(pos + 4 < src.length, "unterminated \\u escape")
              val cp = Integer.parseInt(src.substring(pos + 1, pos + 5), 16)
              pos += 4
              cp.toChar
            case other =>
              throw new IllegalArgumentException(s"unsupported escape \\$other")
          }
          sb.append(decoded); pos += 1
        } else { sb.append(src(pos)); pos += 1 }
      }
      require(pos < src.length, "unterminated string literal")
      pos += 1
      sb.toString
    }

    private def parseNumber(): JAst = {
      ws()
      val start = pos
      if (peek == '-') pos += 1
      while (pos < src.length && (src(pos).isDigit || src(pos) == '.')) pos += 1
      require(pos > start, s"expected number at $pos")
      JLit(src.substring(start, pos).toDouble)
    }
  }

  // ---- compilation ----

  private def compileTop(body: JAst): Option[JqCompiler.Compiled] = body match {
    case JEvents =>
      // identity: the array output re-parses to the same events
      Some(JqCompiler.CompiledPerEvent(JqCompiler.PerEvent(
        None, col("n"), coalesce(col("d"), lit("null")))))
    case o: JObj => compilePerVector(o)
    case _ => None
  }

  private def compilePerVector(o: JObj): Option[JqCompiler.Compiled] = {
    val nExpr = o.fields.collectFirst { case ("n", JLit(s: String)) => lit(s) }
    if (nExpr.isEmpty) return None
    val aggs = o.fields.filterNot(_._1 == "n").map { case (k, v) =>
      aggValue(v).map { case (c, hasAgg) =>
        val agg = if (hasAgg) c else first(c)
        k -> ((_: org.apache.spark.sql.Column) => agg)
      }
    }
    if (aggs.exists(_.isEmpty)) None
    else Some(JqCompiler.CompiledPerVector(
      JqCompiler.PerVector(nExpr.get, aggs.flatten)))
  }

  /** Vector-scope value over a closed-vector row: the aggregate forms
    * become array operations on `events` (size, head-element paths) —
    * identical rendering to the batch tier's `count`/`min_by` because
    * both route numerics/variants through the same cast/to_json
    * machinery.
    */
  private def vecValue(ast: JAst): Option[Column] = {
    def firstEvent: Column = element_at(col("events"), 1)
    def vecPath(segs: Seq[Either[String, Int]]): Option[Column] = segs match {
      case Seq(Left("n")) => Some(firstEvent.getField("n"))
      case Left("d") +: rest =>
        val jsonPath = "$" + rest.map {
          case Left(f)  => s".$f"
          case Right(i) => s"[$i]"
        }.mkString
        val d = firstEvent.getField("d")
        Some(
          if (rest.isEmpty) try_parse_json(d).cast("variant")
          else try_variant_get(try_parse_json(d), jsonPath, "variant"))
      case Seq(Left("t"), Right(i), Left(f)) =>
        Some(element_at(firstEvent.getField("t"), if (i == -1) -1 else i + 1).getField(f))
      case _ => None
    }
    ast match {
      case JLit(s: String)  => Some(lit(s))
      case JLit(d: Double)  => Some(lit(d))
      case JLit(b: Boolean) => Some(lit(b))
      case JLen             => Some(size(col("events")).cast("long"))
      case JPath(0, segs)   => vecPath(segs) // head event = arrival order
      case JPath(_, _)      => None
      case JStr(e)          => vecValue(e).map(_.cast("string"))
      case JBin("+", l, r) if isStringy(l) || isStringy(r) =>
        for { lc <- vecValue(l); rc <- vecValue(r) }
          yield concat(lc.cast("string"), rc.cast("string"))
      case JBin(op, l, r) if CmpOps(op) =>
        for { lc <- vecValue(l); rc <- vecValue(r) } yield cmpCol(op, l, r, lc, rc)
      case JBin("&&", l, r) =>
        for { lc <- vecValue(l); rc <- vecValue(r) }
          yield lc.cast("boolean") && rc.cast("boolean")
      case JBin("||", l, r) =>
        for { lc <- vecValue(l); rc <- vecValue(r) }
          yield lc.cast("boolean") || rc.cast("boolean")
      case JNot(e) => vecValue(e).map(c => !c.cast("boolean"))
      case JIf(c, t, e) =>
        for { cc <- vecValue(c); tc <- vecValue(t); ec <- vecValue(e) }
          yield ifCol(t, e, cc, tc, ec)
      case JBin(op, l, r) =>
        for { lc <- vecValue(l); rc <- vecValue(r) } yield {
          val (ln, rn) = (lc.cast("double"), rc.cast("double"))
          op match {
            case "+" => ln + rn
            case "-" => ln - rn
            case "*" => ln * rn
            case "/" => ln / rn
            case "%" => ln % rn
          }
        }
      case f: JFoldl =>
        // the closed vector array is already in arrival order
        for {
          opParts <- foldlParts(f)
          initD <- f.init match { case JLit(d: Double) => Some(d); case _ => None }
          _ <- evalEvent(opParts._2, elemResolver(identity)) // compilability probe
        } yield aggregate(col("events"), lit(initD), (acc0, ev) =>
          foldStep(opParts._1, acc0,
            evalEvent(opParts._2, elemResolver(_ => ev)).get.cast("double")))
      case JLenOf(e) =>
        vecValue(e).map(c => length(c.cast("string")).cast("long"))
      case JFormat(fmt, as_) =>
        val args = as_.map(vecValue)
        if (args.exists(_.isEmpty)) None else formatConcat(fmt, args.flatten)
      case JJoin(sep, JArr(items)) =>
        val cs = items.map(vecValue)
        if (cs.exists(_.isEmpty)) None
        else Some(concat(intersperse(cs.flatten, sep): _*))
      case JJoin(sep, JMap(_, body)) =>
        // the closed vector array is already in arrival order
        evalEvent(body, elemResolver(identity)) match {
          case Some(_) => // compilable: rebuild per element inside transform
            Some(array_join(transform(col("events"), ev =>
              evalEvent(body, elemResolver(_ => ev)).get.cast("string")), sep))
          case None => None
        }
      case JObj(fields) =>
        val sub = fields.map { case (k, v) => vecValue(v).map(_.as(k)) }
        if (sub.exists(_.isEmpty)) None
        else Some(to_json(struct(sub.flatten: _*)))
      case _ => None
    }
  }

  /** Streaming element resolver: paths over one `events` array element. */
  private def elemResolver(ev: Column => Column)
                          (segs: Seq[Either[String, Int]]): Option[Column] = {
    val e = ev(element_at(col("events"), 1)) // probe target; real calls rebind
    segs match {
      case Seq(Left("n")) => Some(e.getField("n"))
      case Left("d") +: rest =>
        val jsonPath = "$" + rest.map {
          case Left(f)  => s".$f"
          case Right(i) => s"[$i]"
        }.mkString
        val d = e.getField("d")
        Some(
          if (rest.isEmpty) try_parse_json(d).cast("variant")
          else try_variant_get(try_parse_json(d), jsonPath, "variant"))
      case Seq(Left("t"), Right(i), Left(f)) =>
        Some(element_at(e.getField("t"), if (i == -1) -1 else i + 1).getField(f))
      case _ => None
    }
  }

  /** Event-scope path over {n, d, t} (same mapping as JqCompiler). */
  private def pathCol(segs: Seq[Either[String, Int]]): Option[Column] = segs match {
    case Seq(Left("n")) => Some(col("n"))
    case Left("d") +: rest =>
      val jsonPath = "$" + rest.map {
        case Left(f)  => s".$f"
        case Right(i) => s"[$i]"
      }.mkString
      Some(
        if (rest.isEmpty) try_parse_json(col("d")).cast("variant")
        else try_variant_get(try_parse_json(col("d")), jsonPath, "variant"))
    case Seq(Left("t"), Right(i), Left(f)) =>
      Some(element_at(col("t"), if (i == -1) -1 else i + 1).getField(f))
    case _ => None
  }

  private def isStringy(a: JAst): Boolean = a match {
    case JIf(_, t, e)    => isStringy(t) || isStringy(e)
    case JLit(_: String) => true
    case JStr(_)         => true
    case JJoin(_, _)     => true
    case JFormat(_, _)   => true
    case JBin("+", l, r) => isStringy(l) || isStringy(r)
    case _               => false
  }

  private val CmpOps = Set("==", "!=", "<", "<=", ">", ">=")
  private val LogicOps = Set("&&", "||")

  private def isBoolish(a: JAst): Boolean = a match {
    case JLit(_: Boolean)            => true
    case JBin(op, _, _)              => CmpOps(op) || LogicOps(op)
    case JNot(_)                     => true
    case JIf(_, t, e)                => isBoolish(t) && isBoolish(e)
    case _                           => false
  }

  /** Comparison with jsonnet-ish kind alignment: a string on either
    * side compares as strings, otherwise numerically. Conditions cast
    * through boolean so variant payload fields work as guards.
    */
  private def cmpCol(op: String, l: JAst, r: JAst, lc: Column, rc: Column): Column = {
    val (a, b) =
      if (isStringy(l) || isStringy(r)) (lc.cast("string"), rc.cast("string"))
      else if (isBoolish(l) || isBoolish(r)) (lc.cast("boolean"), rc.cast("boolean"))
      else (lc.cast("double"), rc.cast("double"))
    op match {
      case "==" => a === b
      case "!=" => a =!= b
      case "<"  => a < b
      case "<=" => a <= b
      case ">"  => a > b
      case ">=" => a >= b
    }
  }

  /** Branch alignment for `if`: string wins, then boolean, then
    * numeric — so Spark's when() never sees un-coercible branches.
    */
  private def ifCol(t: JAst, e: JAst, cc: Column, tc: Column, ec: Column): Column = {
    val (a, b) =
      if (isStringy(t) || isStringy(e)) (tc.cast("string"), ec.cast("string"))
      else if (isBoolish(t) && isBoolish(e)) (tc, ec)
      else (tc.cast("double"), ec.cast("double"))
    when(cc.cast("boolean"), a).otherwise(b)
  }

  /** `std.format` lowered to a concat: literal runs interleaved with
    * `%s` (string render) and `%d` (integer render) argument slots;
    * `%%` escapes. Unknown verbs or arity mismatch refuse to compile.
    */
  private def formatConcat(fmt: String, args: Seq[Column]): Option[Column] = {
    val parts = Seq.newBuilder[Column]
    val sb = new StringBuilder
    var i = 0
    var argI = 0
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        fmt(i + 1) match {
          case '%' => sb.append('%'); i += 2
          case 's' | 'd' =>
            if (argI >= args.length) return None
            if (sb.nonEmpty) { parts += lit(sb.toString); sb.clear() }
            val a = args(argI)
            parts += (if (fmt(i + 1) == 's') a.cast("string")
                      else a.cast("double").cast("long").cast("string"))
            argI += 1; i += 2
          case _ => return None
        }
      } else { sb.append(fmt(i)); i += 1 }
    }
    if (argI != args.length) return None
    if (sb.nonEmpty) parts += lit(sb.toString)
    Some(concat(parts.result(): _*))
  }

  /** Per-event expression evaluated against one event through a path
    * resolver — the shared body evaluator for `std.map(function(e)
    * ...)` in both tiers (batch rows, streaming array elements).
    */
  private def evalEvent(ast: JAst,
                        resolve: Seq[Either[String, Int]] => Option[Column]): Option[Column] =
    ast match {
      case JLit(s: String)   => Some(lit(s))
      case JLit(d: Double)   => Some(lit(d))
      case JLit(b: Boolean)  => Some(lit(b))
      case JEvtPath(_, segs) => resolve(segs)
      case JStr(e)           => evalEvent(e, resolve).map(_.cast("string"))
      case JLenOf(e)         =>
        evalEvent(e, resolve).map(c => length(c.cast("string")).cast("long"))
      case JFormat(fmt, as_) =>
        val args = as_.map(evalEvent(_, resolve))
        if (args.exists(_.isEmpty)) None else formatConcat(fmt, args.flatten)
      case JJoin(sep, JArr(items)) =>
        val cs = items.map(evalEvent(_, resolve))
        if (cs.exists(_.isEmpty)) None
        else Some(concat(intersperse(cs.flatten, sep): _*))
      case JBin("+", l, r) if isStringy(l) || isStringy(r) =>
        for { lc <- evalEvent(l, resolve); rc <- evalEvent(r, resolve) }
          yield concat(lc.cast("string"), rc.cast("string"))
      case JBin(op, l, r) if CmpOps(op) =>
        for { lc <- evalEvent(l, resolve); rc <- evalEvent(r, resolve) }
          yield cmpCol(op, l, r, lc, rc)
      case JBin("&&", l, r) =>
        for { lc <- evalEvent(l, resolve); rc <- evalEvent(r, resolve) }
          yield lc.cast("boolean") && rc.cast("boolean")
      case JBin("||", l, r) =>
        for { lc <- evalEvent(l, resolve); rc <- evalEvent(r, resolve) }
          yield lc.cast("boolean") || rc.cast("boolean")
      case JNot(e) => evalEvent(e, resolve).map(c => !c.cast("boolean"))
      case JIf(c, t, e) =>
        for { cc <- evalEvent(c, resolve); tc <- evalEvent(t, resolve)
              ec <- evalEvent(e, resolve) } yield ifCol(t, e, cc, tc, ec)
      case JBin(op, l, r) =>
        for { lc <- evalEvent(l, resolve); rc <- evalEvent(r, resolve) } yield {
          val (ln, rn) = (lc.cast("double"), rc.cast("double"))
          op match {
            case "+" => ln + rn
            case "-" => ln - rn
            case "*" => ln * rn
            case "/" => ln / rn
            case "%" => ln % rn
          }
        }
      case JObj(fields) =>
        val sub = fields.map { case (k, v) => evalEvent(v, resolve).map(_.as(k)) }
        if (sub.exists(_.isEmpty)) None else Some(to_json(struct(sub.flatten: _*)))
      case _ => None
    }

  private def intersperse(cs: Seq[Column], sep: String): Seq[Column] =
    if (cs.isEmpty) Seq(lit(""))
    else cs.head +: cs.tail.flatMap(c => Seq(lit(sep), c))

  /** Batch event-row resolver (columns n/d/t of the current row). */
  private def rowResolver(segs: Seq[Either[String, Int]]): Option[Column] = pathCol(segs)

  /** Destructure a foldl body into (op, per-event operand): the body
    * must be `acc op operand` (or `operand op acc` for the commutative
    * ops), the operand free of acc references and numeric — the
    * moving-aggregate envelope. Everything else stays uncompiled.
    */
  private def foldlParts(f: JFoldl): Option[(String, JAst)] = {
    def refs(a: JAst, name: String): Boolean = a match {
      case JEvtPath(`name`, _) => true
      case JStr(e)             => refs(e, name)
      case JLenOf(e)           => refs(e, name)
      case JNot(e)             => refs(e, name)
      case JBin(_, l, r)       => refs(l, name) || refs(r, name)
      case JIf(c, t, e)        => refs(c, name) || refs(t, name) || refs(e, name)
      case JObj(fs)            => fs.exists(x => refs(x._2, name))
      case JArr(is)            => is.exists(refs(_, name))
      case JJoin(_, a2)        => refs(a2, name)
      case JFormat(_, as_)     => as_.exists(refs(_, name))
      case JMap(_, b)          => refs(b, name)
      case JFoldl(_, _, b, i)  => refs(b, name) || refs(i, name)
      case _                   => false
    }
    val acc = f.acc
    f.body match {
      case JBin(op @ ("+" | "-" | "*" | "/"), JEvtPath(`acc`, Seq()), rhs)
          if !refs(rhs, acc) && !isStringy(rhs) => Some((op, rhs))
      case JBin(op @ ("+" | "*"), lhs, JEvtPath(`acc`, Seq()))
          if !refs(lhs, acc) && !isStringy(lhs) => Some((op, lhs))
      case _ => None
    }
  }

  /** One fold step: jsonnet raises on a null operand (there is no jq
    * null-is-identity `+` here), so the compiled tier raises too.
    */
  private def foldStep(op: String, acc: Column, x0: Column): Column = {
    val x = when(x0.isNull, raise_error(lit(
      "jsonnet compiled tier: std.foldl saw null (jsonnet raises here); gate GRAFT_JSONNET_BIN for the subprocess tier")).cast("double"))
      .otherwise(x0)
    op match {
      case "+" => acc + x
      case "-" => acc - x
      case "*" => acc * x
      case "/" => acc / x
    }
  }

  /** Aggregate-scope value: (column, contains-an-aggregate). */
  private def aggValue(ast: JAst): Option[(Column, Boolean)] = ast match {
    case JLit(s: String)  => Some((lit(s), false))
    case JLit(d: Double)  => Some((lit(d), false))
    case JLit(b: Boolean) => Some((lit(b), false))
    case JLen             => Some((count(lit(1)), true))
    case JPath(0, segs)   =>
      // first event of the vector in arrival order, like jq's `.[0]`
      pathCol(segs).map(c => (min_by(c, struct(col("__ts"), col("__seq"))), true))
    case JPath(_, _)      => None // events[i>0] would need an ordered collect
    case JStr(e)          => aggValue(e).map { case (c, a) => (c.cast("string"), a) }
    case JBin("+", l, r) if isStringy(l) || isStringy(r) =>
      for { (lc, la) <- aggValue(l); (rc, ra) <- aggValue(r) }
        yield (concat(lc.cast("string"), rc.cast("string")), la || ra)
    case JBin(op, l, r) if CmpOps(op) =>
      for { (lc, la) <- aggValue(l); (rc, ra) <- aggValue(r) }
        yield (cmpCol(op, l, r, lc, rc), la || ra)
    case JBin("&&", l, r) =>
      for { (lc, la) <- aggValue(l); (rc, ra) <- aggValue(r) }
        yield (lc.cast("boolean") && rc.cast("boolean"), la || ra)
    case JBin("||", l, r) =>
      for { (lc, la) <- aggValue(l); (rc, ra) <- aggValue(r) }
        yield (lc.cast("boolean") || rc.cast("boolean"), la || ra)
    case JNot(e) => aggValue(e).map { case (c, a) => (!c.cast("boolean"), a) }
    case JIf(c, t, e) =>
      for { (cc, ca) <- aggValue(c); (tc, ta) <- aggValue(t)
            (ec, ea) <- aggValue(e) }
        yield (ifCol(t, e, cc, tc, ec), ca || ta || ea)
    case JBin(op, l, r) =>
      for { (lc, la) <- aggValue(l); (rc, ra) <- aggValue(r) } yield {
        val (ln, rn) = (lc.cast("double"), rc.cast("double"))
        (op match {
          case "+" => ln + rn
          case "-" => ln - rn
          case "*" => ln * rn
          case "/" => ln / rn
          case "%" => ln % rn
        }, la || ra)
      }
    case f: JFoldl =>
      // arrival-ordered left fold from the literal init — the exact FP
      // sequence jsonnet's std.foldl runs (same machinery as the jq
      // compiled tier's `reduce`)
      for {
        opParts <- foldlParts(f)
        initD <- f.init match { case JLit(d: Double) => Some(d); case _ => None }
        opnd <- evalEvent(opParts._2, rowResolver)
      } yield {
        val ord = struct(col("__ts"), col("__seq"))
        val items = transform(
          array_sort(collect_list(struct(ord.as("__o"), opnd.cast("double").as("__v")))),
          x => x.getField("__v"))
        (aggregate(items, lit(initD), (acc0, x) => foldStep(opParts._1, acc0, x)), true)
      }
    case JLenOf(e) =>
      aggValue(e).map { case (c, a) => (length(c.cast("string")).cast("long"), a) }
    case JFormat(fmt, as_) =>
      val args = as_.map(aggValue)
      if (args.exists(_.isEmpty)) None
      else formatConcat(fmt, args.flatten.map(_._1)).map(c =>
        (c, args.flatten.exists(_._2)))
    case JJoin(sep, JArr(items)) =>
      val cs = items.map(aggValue)
      if (cs.exists(_.isEmpty)) None
      else Some((concat(intersperse(cs.flatten.map(_._1), sep): _*),
        cs.flatten.exists(_._2)))
    // std.join(sep, std.map(function(e) <string-expr>, events)):
    // arrival-ordered per-event rendering joined into one string — the
    // reference's exposition idiom, as ONE aggregate
    case JJoin(sep, JMap(_, body)) =>
      evalEvent(body, rowResolver).map { c =>
        (array_join(transform(
          array_sort(collect_list(struct(
            struct(col("__ts"), col("__seq")).as("__o"), c.cast("string").as("__v")))),
          x => x.getField("__v")), sep), true)
      }
    case JObj(fields) =>
      val sub = fields.map { case (k, v) => aggValue(v).map { case (c, a) => (c.as(k), a) } }
      if (sub.exists(_.isEmpty)) None
      else Some((to_json(struct(sub.flatten.map(_._1): _*)), sub.flatten.exists(_._2)))
    case _ => None
  }
}
