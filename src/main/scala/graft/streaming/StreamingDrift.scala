package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A label's current embedding-space drift vs the static corpus,
  * stamped with the state version — identical l2sq arithmetic to the
  * batch `emb_drift` row for the same arrived vectors.
  */
final case class DriftUpdate(label: Long, n_batch: Long, l2sq_fp: Long, version: Long)

/** Streaming arm of the embedding-drift screen
  * ([[graft.operators.AnnQueries]] `emb_drift`): new vectors arrive as
  * a stream and fold into per-label running state — the per-dimension
  * 1e6 fixed-point element sums plus the vector count, i.e. 64 longs +
  * 1 per label, O(dims) state no matter how much streams — while the
  * CORPUS side is a static per-(label, dim) sum table loaded as
  * `flatMapGroupsWithState` INITIAL STATE (executor-collapsed and
  * shuffled straight into the state store, the StreamingPercentile
  * discipline: the driver never materializes it). Every update
  * re-evaluates the batch operator's exact arithmetic — the integer
  * cross product sum_b·n_c − sum_c·n_b per dimension, one guarded
  * double division re-quantized to 1e9 fixed point, BIGINT sum of
  * squares — and integer sums are insertion-order-independent, so the
  * final streamed row is BIT-IDENTICAL to the batch `emb_drift` over
  * the same rows under any micro-batch chopping (StreamingDriftSpec
  * pins equality, not a tolerance), and the state store carries the
  * sums across kill/restart. Initial state is applied for EVERY
  * corpus label at batch 0 (Spark invokes the function with an empty
  * row iterator for initial-state-only keys and checkpoints the
  * seeded state), so a label first streamed only after a restart
  * still finds its corpus sums — nC is never 0 for an indexed label
  * (the late-first-seen mechanism is pinned in StreamingRestartSpec
  * on the percentile/HLL arms; the state machinery is identical).
  */
object StreamingDrift {

  /** The shared final-step arithmetic: batch sums + corpus sums →
    * l2sq_fp (the exact ops the batch plan runs per dimension).
    */
  def l2sqFp(sumB: Array[Long], nB: Long, sumC: Array[Long], nC: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < sumB.length) {
      val num = sumB(i) * nC - sumC(i) * nB
      val md = math.floor(num.toDouble / (nB * nC).toDouble * 1000.0 + 0.5).toLong
      acc += md * md
      i += 1
    }
    acc
  }

  /** `corpus` must carry (label, embedding) — the static side;
    * `stream` carries the same. `dim` is the embedding width.
    */
  def driftStream(corpus: DataFrame, stream: DataFrame, dim: Int): Dataset[DriftUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    def fp(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
    // corpus per-label sums, collapsed ON EXECUTORS into one state row
    // per label: (corpusSums, nCorpus, batchSums = 0s, nBatch = 0, ver 0)
    val initState = corpus
      .select(col("label").cast("long").as("l"),
        posexplode(fp(col("embedding"))).as(Seq("dim", "v")))
      .groupBy("l", "dim").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(Long, Int, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (l, rows) =>
        val sums = new Array[Long](dim)
        var n = 0L
        rows.foreach { case (_, d, s, c) => sums(d) = s; n = c }
        (l, (sums.toSeq, n, Seq.fill(dim)(0L), 0L, 0L))
      }
      .groupByKey(_._1)
      .mapValues(_._2)
    stream
      .select(col("label").cast("long").as("_1"), fp(col("embedding")).as("_2"))
      .as[(Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[Long], Long, Seq[Long], Long, Long), DriftUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout, initState) {
        (label, rows, state: GroupState[(Seq[Long], Long, Seq[Long], Long, Long)]) =>
          val (sumC, nC, sumB0, nB0, ver) = state.getOption
            .getOrElse((Seq.fill(dim)(0L), 0L, Seq.fill(dim)(0L), 0L, 0L))
          val sumB = sumB0.toArray
          var nB = nB0
          rows.foreach { case (_, vec) =>
            var i = 0
            while (i < dim) { sumB(i) += vec(i); i += 1 }
            nB += 1
          }
          state.update((sumC, nC, sumB.toSeq, nB, ver + 1))
          if (nB == 0 || nC == 0) Iterator.empty
          else Iterator(DriftUpdate(label, nB,
            l2sqFp(sumB, nB, sumC.toArray, nC), ver + 1))
      }
  }
}
