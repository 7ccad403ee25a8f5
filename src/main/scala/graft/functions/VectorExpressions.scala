package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math for the similarity-search path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is evaluated interpretively — per-element lambda dispatch and
  * boxing — which dominates ANN run time once candidate pairs reach
  * the millions. [[DotProduct]] is a Catalyst `BinaryExpression` with
  * `doGenCode`: whole-stage codegen emits a tight primitive loop, no
  * allocation, and the plan stays inside one codegen stage.
  *
  * Floating-point contract: elements are widened to double and
  * accumulated left-to-right — the exact same IEEE operation sequence
  * as the HOF fold and the generated left-associated SQL oracles, so
  * swapping implementations never changes a ULP.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // children may be unresolved at construction; validate lazily on
  // first evaluation/codegen (AbstractDataType/ExpectsInputTypes are
  // private[sql], so the declarative form isn't available here)
  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"DotProduct needs array<float|double> inputs, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED long arrays — a single
  * codegen'd merge walk, O(n+m) with no allocation. Used for set
  * similarity (Jaccard) over hashed shingle sets, where the generic
  * `array_intersect` pays per-element catalyst-value comparison and
  * set construction.
  *
  * Inputs must be sorted ascending and duplicate-free (callers use
  * `sort_array(array_distinct(...))`); behavior on unsorted input is
  * unspecified.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All LSH table buckets in one pass: for `tables × bits` hyperplanes
  * (flattened row-major into `planes`, each of length `dim`), emit one
  * bucket id per table — bit j of table t set iff
  * dot(vec, plane[t*bits+j]) >= 0.
  *
  * With `probes > 0`, each table additionally emits `probes`
  * multi-probe bucket ids: the assigned bucket with ONE sign bit
  * flipped, chosen in ascending order of |projection| (the planes the
  * vector sits closest to — the perturbations most likely to hold a
  * true neighbor, per Lv et al.'s multi-probe LSH). Output layout is
  * table-major: `[t0 assigned, t0 probe1, …, t0 probeP, t1 assigned,
  * …]`, so element index `i` belongs to table `i / (probes+1)` and is
  * the assigned bucket iff `i % (probes+1) == 0`.
  *
  * Replaces `tables × bits` separate literal-array dot-product
  * expressions, which evaluated interpretively per plane per row and
  * dominated ANN bucket assignment.
  *
  * Codegen calls the compiled `compute` kernel through a reference
  * object, so LSH bucket assignment stays inside the surrounding
  * whole-stage-codegen stage (no `CodegenFallback` row
  * materialization).
  */
case class LshBuckets(child: Expression, planes: Array[Double], dim: Int, bits: Int,
                      probes: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val tables = planes.length / (dim * bits)
  require(probes >= 0 && probes < bits, s"probes must be in [0, bits=$bits), got $probes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(v: ArrayData): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val width = probes + 1
    val out = new Array[Long](tables * width)
    val projs = new Array[Double](bits)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += planes(base + i) * v.getFloat(i); i += 1 }
        if (s >= 0) bucket |= (1L << j)
        projs(j) = s
        j += 1
      }
      out(t * width) = bucket
      // probe buckets: flip the `probes` bits with the smallest
      // |projection| (selection by repeated min — bits <= 48, probes
      // tiny, no sort allocation)
      var taken = 0L // bitmask of already-flipped plane indices
      var p = 0
      while (p < probes) {
        var best = -1
        var bestAbs = Double.MaxValue
        var q = 0
        while (q < bits) {
          if ((taken & (1L << q)) == 0) {
            val a = math.abs(projs(q))
            if (a < bestAbs) { bestAbs = a; best = q }
          }
          q += 1
        }
        taken |= (1L << best)
        out(t * width + p + 1) = bucket ^ (1L << best)
        p += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** All multi-table LSH buckets for a float vector in one pass; with
    * `probes > 0` each table also emits its multi-probe buckets (see
    * [[LshBuckets]] for the layout).
    */
  def lshBuckets(vec: Column, planes: Seq[Seq[Double]], dim: Int, bits: Int,
                 probes: Int = 0): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(vec), planes.flatten.toArray, dim, bits, probes))

  /** Column-level handle for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level handle for [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
