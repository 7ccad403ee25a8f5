package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL faces of the library's native codegen'd expressions, so
  * `spark.sql("SELECT graft_nfc(text) ...")` works the same as the
  * Column API. One list feeds BOTH registration paths: per-session
  * ([[register]], for library callers on an existing session) and
  * spark-submit config ([[graft.plans.GraftExtensions]] via
  * `spark.sql.extensions`).
  */
object GraftSqlFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an INT literal, got $other")
  }

  /** (name, usage, builder) for every exposed function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_nfc", "graft_nfc(str) - Unicode NFC normalization",
      es => NfcNormalize(es.head)),
    ("graft_simhash32",
      "graft_simhash32(toks) - 32-bit SimHash of a token array",
      es => SimHash32(es.head)),
    ("graft_shingle_hashes",
      "graft_shingle_hashes(str, n) - 64-bit hashes of the n-token shingles",
      es => ShingleHashes(es.head, intLit(es(1), "graft_shingle_hashes"))),
    ("graft_dot", "graft_dot(arr, arr) - float/double vector dot product",
      es => DotProduct(es.head, es(1))),
    ("graft_hilbert2", "graft_hilbert2(x, y) - order-16 Hilbert curve index",
      es => HilbertIndex2(es.head, es(1))),
    ("graft_int8_quantize",
      "graft_int8_quantize(arr) - symmetric int8 quantization of a float vector",
      es => Int8Quantize(es.head)),
    ("graft_sorted_intersect",
      "graft_sorted_intersect(arr, arr) - intersection size of two sorted arrays",
      es => SortedIntersectCount(es.head, es(1))))

  /** Register every function on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = all.foreach {
    case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftSqlFunctions", name, usage),
        builder)
  }
}
