package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class PatternSpec extends AnyFunSuite {
  import Pattern._

  /** Deterministic property driver (no scalatest-scalacheck bridge in
    * the offline cache): sample the generator N times from a fixed seed.
    */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B], n: Int = 1000)(f: (A, B) => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      val a = ga.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val b = gb.pureApply(Gen.Parameters.default, seed); seed = seed.next
      f(a, b)
    }
  }
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    forAll(ga, Gen.const(()), 1000)((a, _) => f(a))

  private def regexMatch(p: String, name: String): Boolean =
    (name + ".").matches(Str(p).toRegex)

  test("golden: literal, star, hash semantics (reference src/pattern.ts)") {
    assert(Str("a.b").matches("a.b"))
    assert(!Str("a.b").matches("a.b.c"))
    assert(Str("a.*").matches("a.b"))
    assert(!Str("a.*").matches("a"))
    assert(!Str("a.*").matches("a.b.c"))
    assert(Str("#").matches("a"))
    assert(Str("#").matches("a.b.c"))
    assert(Str("a.#").matches("a"))
    assert(Str("a.#").matches("a.x.y"))
    assert(Str("#.b").matches("b"))
    assert(Str("#.b").matches("x.y.b"))
    assert(!Str("#.b").matches("b.x"))
    assert(Str("a.#.b").matches("a.b"))
    assert(Str("a.#.b").matches("a.x.y.b"))
    assert(!Str("a.#.b").matches("a.b.c"))
    // Reference quirk: a name exhausted with 2 pattern words left fails
    // even when both are '#' (src/pattern.ts:150-152).
    assert(!Str("a.#.#").matches("a"))
    assert(Str("a.#.#").matches("a.x"))
    assert(Str("#.#").matches("a"))
    assert(Str("*.#").matches("lorem.ipsum"))
  }

  test("golden: combinators") {
    val p = And(Seq(Str("lorem.#"), Str("#.ipsum")))
    assert(p.matches("lorem.ipsum"))
    assert(p.matches("lorem.x.ipsum"))
    assert(!p.matches("lorem.x"))
    assert(Not(Str("a.#")).matches("b.c"))
    assert(Or(Seq(Str("a"), Str("b"))).matches("b"))
  }

  test("validate accepts/rejects pattern strings") {
    assert(Str("a.*.b-c.$:x.#").validate)
    assert(!Str("a..b").validate)
    assert(!Str("").validate)
    assert(!Str("ab*").validate)   // wildcard inside a longer word
    assert(!Str("a.b!").validate)  // bad charset
    assert(And(Seq(Str("a"), Not(Str("b.#")))).validate)
  }

  private val word: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.stringOfN(n, Gen.oneOf(('a' to 'c') ++ Seq('-', '$'))))
  private val nameGen: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, word)).map(_.mkString("."))
  private val patWord: Gen[String] = Gen.frequency(5 -> word, 2 -> Gen.const("*"), 2 -> Gen.const("#"))
  private val patGen: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, patWord)).map(_.mkString("."))

  test("property: compiled regex ≡ reference recursive matcher") {
    forAll(nameGen, patGen, n = 20000) { (name: String, pat: String) =>
      assert(regexMatch(pat, name) == Str(pat).matches(name),
        s"pattern=$pat name=$name")
    }
  }

  test("property: '#'-free patterns match names of equal word count only") {
    forAll(nameGen) { name =>
      val stars = EventName.splitWords(name).map(_ => "*").mkString(".")
      assert(Str(stars).matches(name))
    }
  }

  test("fromAny parses combinator maps") {
    val p = Pattern.fromAny(Map("and" -> Seq("lorem.#", Map("not" -> "#.ipsum"))))
    assert(p == And(Seq(Str("lorem.#"), Not(Str("#.ipsum")))))
  }
}
