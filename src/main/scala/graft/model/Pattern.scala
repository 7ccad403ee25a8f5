package graft.model

/** Event-name patterns with RabbitMQ routing-key semantics
  * (reference: src/pattern.ts, README.md:546-553).
  *
  * A string pattern is dot-separated words where a word is either a
  * literal over `[A-Za-z0-9-_$:]`, `*` (exactly one word) or `#`
  * (zero or more words). Patterns compose with `and` / `or` / `not`.
  *
  * Matching is defined by the recursive word-list relation of the
  * reference (src/pattern.ts:146-166). Instead of porting the
  * backtracking matcher to the hot path, [[Pattern.compileRegex]]
  * lowers a string pattern to an equivalent anchored regex over a
  * dot-sentinel encoding (`name + "."`), which Spark evaluates as a
  * codegen'd `RLIKE` — filter-pushable and O(n) per row:
  *
  *   - literal word `w`  →  `\Qw\E\.`
  *   - `*`               →  `[^.]+\.`
  *   - `#`               →  `(?:[^.]+\.)*`
  *
  * Equivalence: on a valid name `w1.….wk`, the sentinel string is
  * `w1.w2.….wk.` — a concatenation of k `word-dot` units. Each
  * pattern word consumes whole units (one for literals/`*`, any
  * number ≥ 0 for `#`), which is exactly the word-list recursion,
  * including the early-exit "trailing `#` matches everything"
  * (src/pattern.ts:149).
  */
sealed trait Pattern {
  import Pattern._

  /** Reference-equivalent direct matcher (used by tests as the oracle
    * for the regex compilation and by driver-side spec validation).
    */
  def matches(name: String): Boolean = this match {
    case Str(p)   => wordsMatch(EventName.splitWords(name).toList, p.split("\\.", -1).toList)
    case And(ps)  => ps.forall(_.matches(name))
    case Or(ps)   => ps.exists(_.matches(name))
    case Not(p)   => !p.matches(name)
  }

  /** Anchored regex over `name + "."`; combine with
    * [[graft.functions.EventFunctions.matchesPattern]].
    *
    * Quirk parity: in the reference relation a name exhausted while ≥2
    * pattern words remain fails even if they are all `#`
    * (src/pattern.ts:150-152 fires before the `#` branch can consume
    * zero words). Hence a *trailing run* of m ≥ 2 `#`s must consume at
    * least one word overall → `(?:[^.]+\.)+`; every other `#` is a
    * plain zero-or-more `(?:[^.]+\.)*`.
    */
  def toRegex: String = this match {
    case Str(p) =>
      val words = p.split("\\.", -1)
      val trailingHashes = words.reverseIterator.takeWhile(_ == "#").size
      val quirkStart = if (trailingHashes >= 2) words.length - trailingHashes else words.length
      val body = words.iterator.zipWithIndex.map {
        case ("#", i) if i == quirkStart => "(?:[^.]+\\.)+"
        case ("#", i) if i > quirkStart  => "" // folded into the + group
        case ("#", _) => "(?:[^.]+\\.)*"
        case ("*", _) => "[^.]+\\."
        case (w, _)   => java.util.regex.Pattern.quote(w) + "\\."
      }.mkString
      "^" + body + "$"
    case _ => throw new IllegalArgumentException(
      "toRegex applies to string patterns; use matchColumn for combinators")
  }

  def validate: Boolean = this match {
    case Str(p) =>
      p.split("\\.", -1).forall { w =>
        w.nonEmpty &&
        (w.length == 1 || (!w.contains('*') && !w.contains('#'))) &&
        w.forall(c => patternChars(c))
      }
    case And(ps) => ps.forall(_.validate)
    case Or(ps)  => ps.forall(_.validate)
    case Not(p)  => p.validate
  }
}

object Pattern {
  final case class Str(pattern: String) extends Pattern
  final case class And(patterns: Seq[Pattern]) extends Pattern
  final case class Or(patterns: Seq[Pattern]) extends Pattern
  final case class Not(pattern: Pattern) extends Pattern

  private val patternChars: Set[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '_', '$', ':', '*', '#')).toSet

  /** Port of the reference's recursive relation (src/pattern.ts:146-166). */
  private[model] def wordsMatch(s: List[String], p: List[String]): Boolean = (s, p) match {
    case (_, "#" :: Nil)      => true
    case (Nil, Nil)           => true
    case (Nil, _) | (_, Nil)  => false
    case (sw :: sRest, pw :: pRest) =>
      pw match {
        case "#" =>
          wordsMatch(sRest, p) || wordsMatch(sRest, pRest) || wordsMatch(s, pRest)
        case "*" => wordsMatch(sRest, pRest)
        case w   => sw == w && wordsMatch(sRest, pRest)
      }
  }

  /** Parse the JSON-ish combinator form used by pipeline specs:
    * either a plain string or a Map with a single `and`/`or`/`not` key.
    */
  def fromAny(value: Any): Pattern = value match {
    case s: String => Str(s)
    case m: java.util.Map[_, _] =>
      val sm = scala.jdk.CollectionConverters.MapHasAsScala(
        m.asInstanceOf[java.util.Map[String, Any]]).asScala
      fromScalaMap(sm.toMap)
    case m: Map[_, _] => fromScalaMap(m.asInstanceOf[Map[String, Any]])
    case other => throw new IllegalArgumentException(s"not a pattern: $other")
  }

  private def fromScalaMap(m: Map[String, Any]): Pattern = {
    def list(v: Any): Seq[Pattern] = v match {
      case l: java.util.List[_] =>
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq.map(fromAny)
      case l: Seq[_] => l.map(fromAny)
      case other     => throw new IllegalArgumentException(s"not a pattern list: $other")
    }
    m.toList match {
      case ("and", v) :: Nil => And(list(v))
      case ("or", v) :: Nil  => Or(list(v))
      case ("not", v) :: Nil => Not(fromAny(v))
      case other => throw new IllegalArgumentException(s"not a pattern object: $other")
    }
  }
}
