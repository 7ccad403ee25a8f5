package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The anchored count-or-time window as a first-class Catalyst
  * operator (SURVEY.md §4.2 "custom operator" tier): a logical node, a
  * planner strategy, and a physical exec whose contract is expressed
  * to the optimizer instead of hidden inside `mapPartitions`.
  *
  * What first-class buys over the opaque version:
  *   - `requiredChildDistribution`/`requiredChildOrdering` let the
  *     planner REUSE an existing partitioning/sort instead of always
  *     inserting repartition+sort;
  *   - `outputPartitioning` passes through, so a downstream
  *     `groupBy(key, vec_id)` needs NO new exchange (the mapPartitions
  *     version forced one because Spark cannot see through lambdas);
  *   - the scan itself is the same O(rows) two-pointer pass with three
  *     scalars of state.
  */
final case class AnchoredWindow(
    keys: Seq[Expression],
    tsMicros: Expression,
    ties: Seq[Expression],
    maxEvents: Long,
    maxMicros: Long,
    vecAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ vecAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(vecAttr :: Nil)

  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object AnchoredWindowStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AnchoredWindow(keys, ts, ties, maxN, maxUs, vecAttr, child) =>
      AnchoredWindowExec(keys, ts, ties, maxN, maxUs, vecAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class AnchoredWindowExec(
    keys: Seq[Expression],
    tsMicros: Expression,
    ties: Seq[Expression],
    maxEvents: Long,
    maxMicros: Long,
    vecAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ vecAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(vecAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((keys ++ (tsMicros +: ties)).map(e => SortOrder(e, Ascending)))

  // the window only appends a column: partitioning and ordering survive
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val localKeys = keys
    val localTs = tsMicros
    val maxN = maxEvents
    val maxUs = maxMicros
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(localKeys, childOutput)
      val tsBound = BindReferences.bindReference(localTs, childOutput)
      val joined = new JoinedRow
      val vecRow = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      var curKey: UnsafeRow = null
      var vecId = 0L
      var count = 0L
      var firstUs = 0L
      iter.map { row =>
        val k = keyProj(row)
        val t = tsBound.eval(row).asInstanceOf[Long]
        if (curKey == null || k != curKey) {
          curKey = k.copy(); vecId = 0L; count = 1L; firstUs = t
        } else if (count >= maxN || t - firstUs >= maxUs) {
          vecId += 1L; count = 1L; firstUs = t
        } else {
          count += 1L
        }
        vecRow.setLong(0, vecId)
        outProj(joined(row, vecRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
