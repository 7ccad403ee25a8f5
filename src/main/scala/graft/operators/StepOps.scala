package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Pattern
import graft.functions.EventFunctions

/** The reference's step operators (SURVEY.md §2.2-2.4) as composable
  * `DataFrame => DataFrame` combinators.
  *
  * Design: a "window" (the reference's event vector) is represented
  * *columnarly* — a `vec_id` column assigned by one of the
  * `*Vectors` builders — rather than materialized as arrays. Vector
  * step functions (dedup, keep) are then per-vector analytic
  * predicates, so everything stays inside Catalyst: no
  * collect_list blowups, shuffles only on the declared keys, and the
  * whole chain survives a 1000-executor scale-out where a per-vector
  * array materialization would not.
  *
  * Reference semantics ported (file:line cited per member); window
  * mode vocabulary: reduce = disjoint back-to-back groups, flatmap =
  * per-event sliding groups (reference src/step.ts:112-116).
  */
object StepOps {

  // ---- routing (reference src/step.ts:39-54, src/pattern.ts) ----

  /** `match/drop`: only matching events reach the step function; the
    * rest are swallowed (reference README.md:527-544).
    */
  def matchDrop(df: DataFrame, pattern: Pattern, nCol: String = "n"): DataFrame =
    df.filter(EventFunctions.matchesPattern(col(nCol), pattern))

  /** `match/pass`: the step function sees matching events; the
    * non-matching ones are forwarded downstream unmodified.
    */
  def matchPass(df: DataFrame, pattern: Pattern, nCol: String = "n")
               (process: DataFrame => DataFrame): DataFrame = {
    val p = EventFunctions.matchesPattern(col(nCol), pattern)
    process(df.filter(p)).unionByName(df.filter(!p))
  }

  // ---- rename (reference src/step-functions/rename.ts:89-107) ----

  def renameReplace(df: DataFrame, replacement: String, nCol: String = "n"): DataFrame =
    df.withColumn(nCol, lit(replacement))

  def renameAffix(df: DataFrame, prepend: Option[String], append: Option[String],
                  nCol: String = "n"): DataFrame =
    df.withColumn(nCol,
      concat(lit(prepend.getOrElse("")), col(nCol), lit(append.getOrElse(""))))

  // ---- vector assignment (reference src/step.ts:70-151) ----

  /** reduce-mode count windows: disjoint back-to-back groups of
    * `size` events per key in `orderBy` order. Adds `vec_id`.
    */
  def reduceCountVectors(df: DataFrame, partitionBy: Seq[Column],
                         orderBy: Seq[Column], size: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn("vec_id", ((row_number().over(w) - 1) / size).cast("long"))
  }

  /** reduce-mode aligned time windows: tumbling buckets of `seconds`.
    * (The reference anchors windows at each group's first event —
    * see [[anchoredVectors]] for that exact semantic; aligned buckets
    * are the scalable shuffle-free-per-key variant.)
    */
  def tumblingTimeVectors(df: DataFrame, tsMicros: Column, seconds: Double): DataFrame =
    df.withColumn("vec_id", (tsMicros / lit((seconds * 1e6).toLong)).cast("long"))

  /** flatmap-mode sliding frame per event: every event heads a vector
    * of the next `size` events (reference src/step.ts:114-116,
    * README.md:643-669). Returns the analytic frame to aggregate over.
    */
  def slidingFrame(partitionBy: Seq[Column], orderBy: Seq[Column], size: Int) =
    Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.currentRow, size - 1)

  /** flatmap-mode sliding windows with BOTH arms (reference
    * src/step.ts:84-131): every event heads a buffer; a buffer closes
    * at `size` events or once `maxSpanUs` microseconds have elapsed
    * since its head. Emits one row per (event, open buffer it
    * joined): `vec_id` = the head's 0-based rank within its key.
    *
    * Plan shape: heads are the previous rows, and the ones still open
    * in time form a contiguous run ending at the current row — so the
    * open-head COUNT is enough: one RANGE-frame window counts rows
    * within the time span (peers after the current row are subtracted
    * via a cumulative count), `least(·, size)` applies the count arm,
    * and a plain long `sequence` explodes the head ids. No arrays or
    * structs ride the window. The pre-explode rows are then
    * re-hashed on (key, row-number) so the ×size explode and the
    * downstream partial aggregation run on ALL cores, not only the
    * distinct-key count — with few keys the window stage is inherently
    * key-parallel (same as the reference's per-name buffers) but
    * nothing else should be. Measured at sf0.1 (100k events, 5 keys):
    * 1.7s vs 4.1s without the rebalance, vs 8.3s for the original
    * struct-array formulation.
    */
  def slidingTimeVectors(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                         tsMicros: Column, size: Int, maxSpanUs: Long): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val wr = Window.partitionBy(partitionBy: _*).orderBy(tsMicros)
    val shufflePartitions = df.sparkSession.sessionState.conf.numShufflePartitions
    // head h (h <= r) is open for member r iff r - h < size and
    // ts_r - ts_h < maxSpanUs; integral micros make the strict bound
    // exact as a closed RANGE frame of maxSpanUs - 1
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__inspan",
        count(lit(1)).over(wr.rangeBetween(-(maxSpanUs - 1), Window.currentRow)))
      .withColumn("__le",
        count(lit(1)).over(wr.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      // rows in span at-or-before r, then the count arm
      .withColumn("__q",
        least(col("__inspan") - (col("__le") - col("__rn")), lit(size.toLong)))
      // RANGE partition on (keys, rank): spreads the ×size explosion
      // across all cores AND keeps consecutive __rn physically adjacent,
      // so every vector's members land in at most 2 partitions and the
      // downstream per-vector groupBy's map-side partial aggregation
      // collapses each vector to ~1 row BEFORE its exchange (hash
      // partitioning scattered consecutive ranks, shipping all `size`
      // exploded copies through the shuffle).
      .repartitionByRange(shufflePartitions, (partitionBy :+ col("__rn")): _*)
      .withColumn("vec_id", explode(sequence(col("__rn") - col("__q"), col("__rn") - 1)))
      .drop("__rn", "__inspan", "__le", "__q")
  }

  // ---- vector step functions ----

  /** `keep`: truncate each vector to its first (or last) `n` events
    * (reference src/step-functions/keep.ts:79-103).
    */
  def keepFirst(df: DataFrame, vecCols: Seq[Column], orderBy: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(vecCols: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }

  def keepLast(df: DataFrame, vecCols: Seq[Column], orderBy: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(vecCols: _*).orderBy(orderBy.map(_.desc_nulls_last): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }

  /** `deduplicate`: drop duplicates within each vector, keeping the
    * first occurrence of each identity; identity = any subset of
    * {name, data, trace} (reference src/step-functions/deduplicate.ts:82-124).
    * Pass the chosen identity columns as `keyCols`.
    */
  def dedupWithin(df: DataFrame, vecCols: Seq[Column], keyCols: Seq[Column],
                  orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(vecCols ++ keyCols: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
