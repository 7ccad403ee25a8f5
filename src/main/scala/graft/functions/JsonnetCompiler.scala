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

    def parseFunction(): JAst = {
      require(tryEat("function"), "expression must be a function")
      eat('('); require(ident() == "events", "single argument must be 'events'"); eat(')')
      val body = parseAdditive()
      ws()
      require(pos >= src.length, s"trailing input at $pos: '${src.drop(pos)}'")
      body
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
      if (tryEat("std.length(events)")) JLen
      else if (tryEat("std.toString(")) { val e = parseAdditive(); eat(')'); JStr(e) }
      else if (tryEat("events")) parseEventsRef()
      else if (peek == '{') parseObj()
      else if (peek == '"') JLit(parseString())
      else if (tryEat("true")) JLit(true)
      else if (tryEat("false")) JLit(false)
      else if (tryEat("null")) JLit(null)
      else if (peek == '(') { eat('('); val e = parseAdditive(); eat(')'); e }
      else parseNumber()
    }

    /** After `events`: bare (the whole vector) or `[i]` + path segs. */
    private def parseEventsRef(): JAst = {
      ws()
      if (peek != '[') return JEvents
      eat('[')
      val idx = parseNumber().asInstanceOf[JLit].v.asInstanceOf[Double].toInt
      eat(']')
      val segs = scala.collection.mutable.ArrayBuffer[Either[String, Int]]()
      var done = false
      while (!done) {
        if (peek == '.' && pos + 1 < src.length &&
            (src(pos + 1).isLetter || src(pos + 1) == '_')) {
          pos += 1; segs += Left(ident())
        } else if (peek == '[') {
          pos += 1; ws()
          val n = parseNumber().asInstanceOf[JLit].v.asInstanceOf[Double].toInt
          eat(']')
          segs += Right(n)
        } else done = true
      }
      JPath(idx, segs.toSeq)
    }

    private def parseObj(): JAst = {
      eat('{')
      val fields = Seq.newBuilder[(String, JAst)]
      var more = true
      while (more) {
        ws()
        val k = if (peek == '"') parseString() else ident()
        eat(':')
        fields += (k -> parseAdditive())
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
        Some(element_at(firstEvent.getField("t"), i + 1).getField(f))
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
      case JObj(fields) =>
        val sub = fields.map { case (k, v) => vecValue(v).map(_.as(k)) }
        if (sub.exists(_.isEmpty)) None
        else Some(to_json(struct(sub.flatten: _*)))
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
      Some(element_at(col("t"), i + 1).getField(f))
    case _ => None
  }

  private def isStringy(a: JAst): Boolean = a match {
    case JLit(_: String) => true
    case JStr(_)         => true
    case JBin("+", l, r) => isStringy(l) || isStringy(r)
    case _               => false
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
    case JObj(fields) =>
      val sub = fields.map { case (k, v) => aggValue(v).map { case (c, a) => (c.as(k), a) } }
      if (sub.exists(_.isEmpty)) None
      else Some((to_json(struct(sub.flatten.map(_._1): _*)), sub.flatten.exists(_._2)))
    case _ => None
  }
}
