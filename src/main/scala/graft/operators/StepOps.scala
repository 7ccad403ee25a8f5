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
    * Grouping is pure per-key rank arithmetic, so the rank comes from
    * [[ParallelRank]] — full-cluster parallelism even when the key
    * cardinality is a handful of event names.
    */
  def reduceCountVectors(df: DataFrame, partitionBy: Seq[Column],
                         orderBy: Seq[Column], size: Int,
                         smallThreshold: Long = -1L): DataFrame =
    ParallelRank.withRowNumber(df, partitionBy, orderBy, "__rcrn", smallThreshold)
      .withColumn("vec_id", ((col("__rcrn") - 1) / size).cast("long"))
      .drop("__rcrn")

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

  /** [[slidingFrame]] at scale: the same leading row-frame
    * aggregation, evaluated per (key, rank-bucket) instead of per key
    * — a plain `partitionBy(key)` frame caps the stage at #keys tasks
    * (25x wall at 100x data measured on 5 keys). Each row's frame
    * reaches at most `size - 1` rows forward, so buckets of G
    * consecutive ranks with the NEXT bucket's first `size - 1` rows
    * copied in as context make every real row's frame locally exact;
    * context rows are dropped after aggregation. `build` receives the
    * context-extended frame and applies its `.over(w)` aggregates.
    */
  def withSlidingFrameAggs(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                           size: Int, smallThreshold: Long = -1L)
                          (build: (DataFrame, org.apache.spark.sql.expressions.WindowSpec) => DataFrame): DataFrame = {
    // size-adaptive, like the other segmented windows
    if (df.count() <= ParallelRank.resolveThreshold(df, smallThreshold))
      return build(df, slidingFrame(partitionBy, orderBy, size))
    val bucketRows = 4096L
    val ranked = ParallelRank.withRowNumber(df, partitionBy, orderBy, "__sfrn", 0L)
    val base = ranked.withColumn("__sfb", expr(s"(__sfrn - 1) div ${bucketRows}L"))
    val ctx = base.filter((col("__sfrn") - 1) % lit(bucketRows) < lit(size - 1).cast("long"))
      .withColumn("__sfb", col("__sfb") - 1)
      .withColumn("__sfctx", lit(true))
    val all = base.withColumn("__sfctx", lit(false)).unionByName(ctx)
    val w = Window.partitionBy((partitionBy :+ col("__sfb")): _*).orderBy(orderBy: _*)
      .rowsBetween(Window.currentRow, size - 1)
    build(all, w).filter(!col("__sfctx")).drop("__sfrn", "__sfb", "__sfctx")
  }

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
                         tsMicros: Column, size: Int, maxSpanUs: Long,
                         smallThreshold: Long = -1L): DataFrame = {
    // head h (h <= r) is open for member r iff r - h < size and
    // ts_r - ts_h < maxSpanUs; integral micros make the strict bound
    // exact as a closed RANGE frame of maxSpanUs - 1.
    //
    // Size-adaptive: below the threshold the plain per-key windows win
    // (one pass; a small input sorts on one task faster than the
    // segmented plan's stat/count/window passes run) — see
    // [[ParallelRank.SmallInputRows]].
    if (df.count() <= ParallelRank.resolveThreshold(df, smallThreshold)) {
      val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      val wr = Window.partitionBy(partitionBy: _*).orderBy(tsMicros)
      val shufflePartitions = df.sparkSession.sessionState.conf.numShufflePartitions
      return df.withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__inspan",
          count(lit(1)).over(wr.rangeBetween(-(maxSpanUs - 1), Window.currentRow)))
        .withColumn("__le",
          count(lit(1)).over(wr.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__q",
          least(col("__inspan") - (col("__le") - col("__rn")), lit(size.toLong)))
        .repartitionByRange(shufflePartitions, (partitionBy :+ col("__rn")): _*)
        .withColumn("vec_id", explode(sequence(col("__rn") - col("__q"), col("__rn") - 1)))
        .drop("__rn", "__inspan", "__le", "__q")
    }
    //
    // TIME-BUCKET SEGMENTATION. The straightforward plan windows over
    // partitionBy(keys) alone — with a handful of event names over
    // billions of rows that caps the whole stage at #keys tasks (the
    // low-cardinality window killer: 5.9x wall at 100x data measured
    // on 5 keys). But every quantity here is TIME-LOCAL: the open
    // heads for a member lie within maxSpanUs behind it (the count
    // arm only ever SHRINKS that set). So windows run per (key,
    // time-bucket) — parallelism grows with the timeline — with the
    // last maxSpan of each bucket COPIED into the next as context
    // rows, which make the trailing counts of early members exact and
    // are dropped after the window stage. The only global quantity,
    // the head's per-key rank (= vec_id), is reassembled from a tiny
    // per-(key, bucket) real-row count table: for real AND context
    // rows alike, global rank = bucket offset - context count + local
    // rank (context rows are exactly the previous bucket's tail, so
    // both reduce to the same formula). Output is row-for-row
    // IDENTICAL to the single-task-per-key plan.
    val spark = df.sparkSession
    val shufflePartitions = spark.sessionState.conf.numShufflePartitions
    val strideUs = maxSpanUs * 4 // context duplication = span/stride = 25%
    val keyNames = partitionBy.indices.map(i => s"__stk$i")
    val base = partitionBy.zip(keyNames).foldLeft(df) { case (d, (c, n)) =>
        d.withColumn(n, c)
      }
      .withColumn("__ts0", tsMicros)
      .withColumn("__bkt", expr(s"__ts0 div ${strideUs}L"))
    val ctx = base
      .filter(col("__ts0") >= (col("__bkt") + 1) * lit(strideUs) - lit(maxSpanUs - 1))
      .withColumn("__bkt", col("__bkt") + 1)
      .withColumn("__ctx", lit(true))
    val all = base.withColumn("__ctx", lit(false)).unionByName(ctx)
    val keyB = keyNames.map(col) :+ col("__bkt")
    val w = Window.partitionBy(keyB: _*).orderBy(orderBy: _*)
    val wr = Window.partitionBy(keyB: _*).orderBy(col("__ts0"))
    val local = all
      .withColumn("__lrn", row_number().over(w).cast("long"))
      .withColumn("__inspan",
        count(lit(1)).over(wr.rangeBetween(-(maxSpanUs - 1), Window.currentRow)))
      .withColumn("__lle",
        count(lit(1)).over(wr.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      // rows in span at-or-before r (ties after r are local: a tie
      // group shares its bucket), then the count arm
      .withColumn("__q",
        least(col("__inspan") - (col("__lle") - col("__lrn")), lit(size.toLong)))
    // tiny: one row per (key, bucket) — real rows feed the per-key
    // cumulative rank offset, context counts shift local ranks back
    val cnts = all.groupBy(keyB: _*)
      .agg(sum(when(col("__ctx"), 0L).otherwise(1L)).as("__real"),
        sum(when(col("__ctx"), 1L).otherwise(0L)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__real")).over(
          Window.partitionBy(keyNames.map(col): _*).orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__real")
    local
      .join(broadcast(cnts), (keyNames :+ "__bkt").toSeq)
      .filter(!col("__ctx"))
      .withColumn("__rn", col("__off") - col("__c") + col("__lrn"))
      // RANGE partition on (keys, rank): spreads the ×size explosion
      // across all cores AND keeps consecutive __rn physically adjacent,
      // so every vector's members land in at most 2 partitions and the
      // downstream per-vector groupBy's map-side partial aggregation
      // collapses each vector to ~1 row BEFORE its exchange (hash
      // partitioning scattered consecutive ranks, shipping all `size`
      // exploded copies through the shuffle).
      .repartitionByRange(shufflePartitions, (partitionBy :+ col("__rn")): _*)
      .withColumn("vec_id", explode(sequence(col("__rn") - col("__q"), col("__rn") - 1)))
      .drop((Seq("__ts0", "__bkt", "__ctx", "__lrn", "__inspan", "__lle", "__q",
        "__c", "__off", "__rn") ++ keyNames): _*)
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
