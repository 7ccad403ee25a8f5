package graft.tools

/** Fallback inventory for the jq compiled tier (round-16 judge item):
  * a curated corpus of jq program forms — the shapes reference
  * pipelines and data-pipeline users actually write, grouped by
  * family — classified by `JqCompiler.tryCompile`/`tryCompileWrapped`
  * outcome. The committed table (BENCH_NOTES_r16.md) is the measured
  * basis for deciding which forms to lower next: widening should
  * follow fallback frequency, not guesswork.
  *
  * Run: `sbt "runMain graft.tools.JqInventory"` — prints a markdown
  * table plus per-program rows for the fallback families.
  */
object JqInventory {

  /** (family, program). Families sorted in output; a family is
    * "compiled" when every instance compiles.
    */
  val corpus: Seq[(String, String)] = Seq(
    // ---- reference-example shapes (examples/*.yaml) ----
    "ref: map(.d) sink projection  [r16 widened]" -> "map(.d)",
    "ref: fmod drop filter (wrapped)" -> ".[].d | if fmod(.; 2) == 0 then empty else . end",
    // ---- per-event stream forms ----
    "per-event: select + object" -> """.[] | select(.d.k > 3) | {n: "out", d: {a: .d.k}}""",
    "per-event: chained selects" -> """.[] | select(.d.k > 3) | select(.n == "x") | {n: "out", d: {a: .d.m}}""",
    "per-event: binding" -> """.[] | .d.k as $x | {n: "out", d: {a: $x, b: ($x + 1)}}""",
    "per-event: if-value (kind-aligned)" -> """.[] | {n: "out", d: {a: (if .d.k > 0 then (.d.k + 0) else 0 end)}}""",
    "per-event: if-value (bare-path branch)" -> """.[] | {n: "out", d: {a: (if .d.k > 0 then .d.k else 0 end)}}""",
    "per-event: alternative //" -> """.[] | {n: "out", d: {a: (.d.mb // 0)}}""",
    "per-event: string interpolation" -> """.[] | {n: "out", d: {a: "k=\(.d.k)"}}""",
    "per-event: regex test/gsub" -> """.[] | select(.d.s | test("^a")) | {n: "out", d: {a: (.d.s | gsub("x"; "y"))}}""",
    "per-event: split/join" -> """.[] | {n: "out", d: {a: (.d.s | split(",") | join(";"))}}""",
    "per-event: tostring/tonumber" -> """.[] | {n: "out", d: {a: (.d.ns | tonumber), b: (.d.k | tostring)}}""",
    // ---- vector aggregates ----
    "vector: map|add + length + .[0]" -> """{n: "agg", d: {s: (map(.d.k) | add), c: length, f: .[0].d.k}}""",
    "vector: group_by count/sum" -> """{n: "agg", d: (group_by(.n) | map({k: .[0].n, c: length}))}""",
    "vector: reduce fold" -> """{n: "agg", d: (reduce .[] as $x (0; . + $x.d.k))}""",
    "vector: sort_by" -> """{n: "agg", d: (sort_by(.n) | map({k: .n}))}""",
    "vector: min_by/max_by" -> """{n: "agg", d: {lo: (min_by(.d.s) | .d.k), hi: (max_by(.d.s) | .d.k)}}""",
    "vector: unique_by|length" -> """{n: "agg", d: {u: (unique_by(.n) | length)}}""",
    "vector: map(cond)|any / all  [r16 widened]" -> """{n: "agg", d: {x: (map(.d.k > 3) | any), y: (map(.d.k > 0) | all)}}""",
    "stream cap: limit(n; .[] | ...)  [r16 widened]" -> """limit(3; .[] | select(.d.k > 5) | {n: "out", d: {a: .d.k}})""",
    // ---- entries / keys ----
    "entries: filter-object" -> """.[] | {n: .n, d: (.d | to_entries | map(select(.key != "x")) | from_entries)}""",
    "entries: keys" -> """.[] | {n: .n, d: {ks: (.d | keys)}}""",
    // ---- KNOWN-OUT families (fallback candidates, ranked by how
    // often a pipeline user reaches for them) ----
    "out: del / with_entries" -> """.[] | {n: "out", d: (.d | del(.k))}""",
    "out: with_entries" -> """.[] | {n: "out", d: (.d | with_entries(.value |= tostring))}""",
    "out: object merge +" -> """.[] | {n: "out", d: (.d + {tag: 1})}""",
    "out: array slice" -> """{n: "agg", d: (map(.d.k) | .[0:3])}""",
    "out: string slice" -> """.[] | {n: "out", d: {a: .d.s[0:3]}}""",
    "out: first()/last()" -> """{n: "agg", d: {f: first(.[] | .d.k), l: last(.[] | .d.k)}}""",
    "out: .. recursion" -> """{n: "agg", d: {nums: ([.. | numbers] | length)}}""",
    "out: paths/getpath" -> """.[] | {n: "out", d: {p: (.d | paths | length)}}""",
    "out: tojson/fromjson" -> """.[] | {n: "out", d: {j: (.d | tojson)}}""",
    "out: try/catch" -> """.[] | {n: "out", d: {a: (try (.d.ns | tonumber) catch 0)}}""",
    "out: range generator" -> """{n: "agg", d: ([range(3)] | length)}""",
    "out: @csv/@base64 formats" -> """{n: "agg", d: (map(.d.k) | @csv)}""",
    "out: until/while loops" -> """.[] | {n: "out", d: {a: ([.d.k] | until(.[0] > 9; [.[0] + 1])[0])}}""",
    "out: date builtins" -> """.[] | {n: "out", d: {t: (.t[0].i | floor | todate)}}""",
    "out: splits regex generator" -> """.[] | {n: "out", d: {a: ([.d.s | splits("a")] | length)}}""")

  def main(args: Array[String]): Unit = {
    import graft.functions.JqCompiler
    val rows = corpus.map { case (family, prog) =>
      val compiled = JqCompiler.tryCompile(prog).isDefined ||
        JqCompiler.tryCompileWrapped(prog).isDefined ||
        JqCompiler.tryCompileSinkMap(prog).isDefined
      (family, prog, compiled)
    }
    val (in, out) = rows.partition(_._3)
    println(s"| family | tier |")
    println(s"|---|---|")
    rows.foreach { case (f, _, c) =>
      println(s"| $f | ${if (c) "compiled" else "SUBPROCESS"} |")
    }
    println()
    println(s"compiled ${in.size}/${rows.size}; subprocess-tier families: ${out.size}")
    out.foreach { case (f, p, _) => println(s"  FALLBACK $f :: $p") }
  }
}
