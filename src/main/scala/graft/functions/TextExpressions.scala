package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernels: whitespace-tokenize, shingle, md5-hash,
  * simhash — each in one compiled pass per row.
  *
  * The equivalent column compositions
  * (`transform(shingles(tokens(text)), tokenHash)`, or 32 stacked
  * `aggregate` HOFs for simhash) are interpreted higher-order
  * functions; measured on the documents corpus they dominated every
  * dedup query. These expressions do the same work in plain JVM code;
  * outputs are identical: hash = first 4 md5 bytes big-endian, exactly
  * `conv(substring(md5(s),1,8),16,10)` and exactly the generated
  * DuckDB oracle term.
  *
  * Codegen: both expressions implement `doGenCode` by invoking their
  * own compiled `compute` kernel through a reference object — the
  * surrounding plan stays inside one whole-stage-codegen stage (no
  * `CodegenFallback` row materialization), and the kernel itself is
  * ordinary JIT-compiled JVM code, which is where the time goes.
  */
private[functions] object TextKernels {
  /** MessageDigest is not thread-safe and getInstance is not free —
    * cache one per executor thread.
    */
  val md5: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of `s` (UTF-8), big-endian unsigned. */
  def hash32(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** 8 md5 bytes of `d` starting at `off`, big-endian, as the signed
    * two's-complement long — the full-width hash for span keys where
    * 32-bit collisions would merely be engine-consistent rather than
    * impossible. Mirrored in DuckDB by assembling two 32-bit hex
    * chunks: `(hi - 2^32·[hi ≥ 2^31])·2^32 + lo` (max value is exactly
    * BIGINT max, so the arithmetic never overflows there).
    */
  def hash64(d: Array[Byte], off: Int): Long = {
    var h = 0L
    var i = off
    while (i < off + 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Whitespace tokens, matching `split(trim(text), "\\s+")` with
    * empties removed.
    */
  def tokens(text: String): Array[String] = {
    val toks = text.trim.split("\\s+")
    if (toks.length == 1 && toks(0).isEmpty) Array.empty[String] else toks
  }
}

/** Ordered 32-bit hashes of the n-word shingles of a text column;
  * `n = 1` degenerates to per-token hashes (with multiplicity).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(input: UTF8String): ArrayData = {
    val toks = TextKernels.tokens(input.toString)
    val nToks = toks.length
    if (nToks < n) return new GenericArrayData(Array.empty[Long])
    val md = TextKernels.md5.get()
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
      out(i) = TextKernels.hash32(md, sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ordered FULL-WIDTH (128-bit) hashes of the n-word shingles of a
  * text column, as `array<struct<h1,h2>>` — both md5 halves, each a
  * big-endian signed 64-bit long. Same single kernel pass as
  * [[ShingleHashes]]; used where a span hash is the IDENTITY of the
  * span (duplicated-span detection) and a 32-bit key would collide at
  * ~80k distinct spans (birthday bound), versus never at 128 bits for
  * any practical corpus.
  */
case class ShingleHashes128(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)

  def compute(input: UTF8String): ArrayData = {
    val toks = TextKernels.tokens(input.toString)
    val nToks = toks.length
    if (nToks < n) return new GenericArrayData(Array.empty[Any])
    val md = TextKernels.md5.get()
    val out = new Array[Any](nToks - n + 1)
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
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        TextKernels.hash64(d, 0), TextKernels.hash64(d, 8))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes128", this, classOf[ShingleHashes128].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash of a token array (with multiplicity): bit j of the
  * result is 1 iff the sum of ±1 votes from bit j of each token's
  * 32-bit hash is positive — one md5 per token, one vote pass, where
  * the HOF formulation (32 `aggregate` calls each re-`transform`ing
  * the token hashes) recomputed every md5 32 times.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  def compute(toks: ArrayData): Long = {
    val md = TextKernels.md5.get()
    val votes = new Array[Int](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = TextKernels.hash32(md, toks.getUTF8String(i).toString)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHash32].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * standard text-cleaning step that folds decomposed sequences
  * (e + U+0301 → é) so downstream hashing/dedup sees one spelling.
  * `java.text.Normalizer` is the JDK's implementation of the same
  * algorithm DuckDB's `nfc_normalize` implements, which the
  * `text_normalize` oracle exploits for an exact cross-engine check.
  * Fast path: already-normalized input (all-ASCII in particular)
  * returns the original UTF8String, no copy.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Ordered hashes of the n-word shingles of `text`. */
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))

  /** Ordered 128-bit (struct<h1,h2>) hashes of the n-word shingles. */
  def shingleHashes128(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes128(ColumnBridge.expression(text), n))

  /** Native 32-bit simhash of a token array. */
  def simHash32(toks: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(toks)))

  /** Unicode NFC normalization (codegen'd; no-copy fast path). */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
