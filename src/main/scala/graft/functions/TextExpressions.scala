package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernel: whitespace-tokenize, build n-word
  * shingles, and md5-hash each — in one compiled pass per row.
  *
  * The equivalent column composition
  * (`transform(shingles(tokens(text)), tokenHash)`) is a stack of
  * interpreted higher-order functions; measured at ~60µs per md5 on
  * the documents corpus it dominated every dedup query. This
  * expression does the same work in plain JVM code (~100x less
  * overhead); outputs are identical: hash = first 4 md5 bytes
  * big-endian, exactly `conv(substring(md5(s),1,8),16,10)` and
  * exactly the generated DuckDB oracle term.
  *
  * `n = 1` degenerates to per-token hashes (with multiplicity).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.trim.split("\\s+")
    val nToks = if (toks.length == 1 && toks(0).isEmpty) 0 else toks.length
    if (nToks < n) return new GenericArrayData(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](nToks - n + 1)
    var i = 0
    while (i <= nToks - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Ordered hashes of the n-word shingles of `text`. */
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
}
