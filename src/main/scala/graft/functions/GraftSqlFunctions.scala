package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL faces of the library's native codegen'd expressions, so
  * `spark.sql("SELECT graft_nfc(text) ...")` works the same as the
  * Column API. ONE triple list ([[entries]]) feeds BOTH registration
  * paths: per-session ([[register]], for library callers on an
  * existing session) and spark-submit config
  * ([[graft.plans.GraftExtensions]] via `spark.sql.extensions`).
  */
object GraftSqlFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an INT literal, got $other")
  }

  private def doubleArrayLit(e: Expression, fn: String): Array[Double] = {
    import org.apache.spark.sql.types._
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: anchors must be a foldable array literal, got $e")
    e.dataType match {
      case ArrayType(et, _) =>
        val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until ad.numElements()).map { i =>
          // a NULL element would read as 0.0 through the primitive
          // getters and silently skew that dimension's code bit
          if (ad.isNullAt(i)) throw new IllegalArgumentException(
            s"$fn: anchors array has a NULL element at index $i")
          et match {
            case DoubleType  => ad.getDouble(i)
            case FloatType   => ad.getFloat(i).toDouble
            case IntegerType => ad.getInt(i).toDouble
            case LongType    => ad.getLong(i).toDouble
            case other => throw new IllegalArgumentException(
              s"$fn: numeric anchors only, got array<$other>")
          }
        }.toArray
      case other => throw new IllegalArgumentException(
        s"$fn: anchors must be an array literal, got $other")
    }
  }

  /** (name, usage, arity, raw builder) for every exposed function. */
  private val defs: Seq[(String, String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_nfc", "graft_nfc(str) - Unicode NFC normalization", 1,
      es => NfcNormalize(es.head)),
    ("graft_simhash32",
      "graft_simhash32(toks) - 32-bit SimHash of a token array", 1,
      es => SimHash32(es.head)),
    ("graft_shingle_hashes",
      "graft_shingle_hashes(str, n) - 64-bit hashes of the n-token shingles", 2,
      es => ShingleHashes(es.head, intLit(es(1), "graft_shingle_hashes"))),
    ("graft_dot", "graft_dot(arr, arr) - float/double vector dot product", 2,
      es => DotProduct(es.head, es(1))),
    ("graft_hilbert2", "graft_hilbert2(x, y) - order-16 Hilbert curve index", 2,
      es => HilbertIndex2(es.head, es(1))),
    // negative arity = minimum count (variadic); HilbertIndexN's own
    // require bounds the axis count at 4 and n·bits at 63
    ("graft_hilbertn",
      "graft_hilbertn(bits, x1, ..., xn) - n-dimensional Hilbert index (2-4 axes)", -3,
      es => HilbertIndexN(es.tail, intLit(es.head, "graft_hilbertn"))),
    ("graft_int8_quantize",
      "graft_int8_quantize(arr) - symmetric int8 quantization of a float vector", 1,
      es => Int8Quantize(es.head)),
    ("graft_sorted_intersect",
      "graft_sorted_intersect(arr, arr) - intersection size of two sorted arrays", 2,
      es => SortedIntersectCount(es.head, es(1))),
    // Hamming distance between two codes is already native SQL:
    // bit_count(a ^ b) — no face needed, only the packer is custom
    ("graft_signpack",
      "graft_signpack(vec, anchors) - 1-bit sign quantization of a <=64-dim vector into one long (anchors: foldable numeric array)", 2,
      es => SignPack(es.head, doubleArrayLit(es(1), "graft_signpack"))),
    ("graft_signpackn",
      "graft_signpackn(vec, anchors) - 1-bit sign quantization of an any-dim vector into array<bigint> words (anchors: foldable numeric array)", 2,
      es => SignPackN(es.head, doubleArrayLit(es(1), "graft_signpackn"))),
    ("graft_hamming",
      "graft_hamming(code_a, code_b) - Hamming distance between two array<bigint> binary codes", 2,
      es => CodeHamming(es.head, es(1))))

  /** The registration triples, shared by both paths. Builders validate
    * arity up front so a wrong-arg-count call reports the usage string
    * instead of a raw IndexOutOfBounds from `es(1)`.
    */
  val entries: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    defs.map { case (name, usage, arity, raw) =>
      val checked: FunctionBuilder = es => {
        val ok = if (arity >= 0) es.length == arity else es.length >= -arity
        if (!ok) throw new IllegalArgumentException(
          s"$name expects ${if (arity >= 0) arity.toString else s"at least ${-arity}"} " +
            s"argument(s), got ${es.length}; usage: $usage")
        raw(es)
      }
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftSqlFunctions", name, usage),
        checked)
    }

  /** Register every function on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = entries.foreach {
    case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
