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

  test("tryCompile falls back (None) outside the subset") {
    assert(JqCompiler.tryCompile(".[] | .d.k | tostring").isEmpty)
    assert(JqCompiler.tryCompile("group_by(.n)").isEmpty)
    assert(JqCompiler.tryCompile(".[] | {n: \"x\", d: .d.k}").isDefined)
    assert(JqCompiler.tryCompile(".[] | {n: \"x\", extra: 1}").isEmpty) // invalid envelope
    assert(JqCompiler.tryCompile("{n: \"agg\", d: {s: (map(.d.k) | add), c: length}}").isDefined)
  }
}
