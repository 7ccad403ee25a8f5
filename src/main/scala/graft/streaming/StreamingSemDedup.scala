package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ann.SemDedup
import graft.functions.VectorExpressions

/** One semantic-dedup verdict under the ADMISSION rule: kept iff no
  * already-kept same-bucket representative has fixed-point cosine ≥
  * the threshold. `vec_id` is the idempotent sink key.
  */
final case class SemVerdict(vec_id: Long, bucket: Int, kept: Boolean)

/** Streaming arm of semantic dedup — the embedding-space tier of the
  * incremental-dedup family (exact hash / MinHash / chunk arms
  * already stream): each arriving vector folds into its sign-LSH
  * bucket's state, which holds the KEPT representatives' fixed-point
  * unit vectors; a newcomer within `tauFp` of any kept rep is marked
  * duplicate, otherwise it is admitted and joins the state — exactly
  * [[SemDedup.dedupSemanticSequential]]'s greedy rule, which the
  * chopping and kill/restart differentials pin.
  *
  * State shape at 100 TB: one group per sign bucket; each holds its
  * kept reps (dim longs each). The [[SemDedup.autoBits]] policy sizes
  * buckets to ~`target` members, so per-group state is bounded and
  * the group count (2^bits) scales with the corpus — the same
  * contraction that bounds the batch self-join. In-batch arrivals
  * sort by id before the fold; cross-batch arrival order is the
  * source's contract, like every streaming-dedup arm.
  *
  * `emb` needs (vec_id, embedding).
  */
object StreamingSemDedup {

  def verdictStream(emb: DataFrame, dim: Int, bits: Int,
                    tauFp: Long): Dataset[SemVerdict] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val keyed = emb
      .select(col("vec_id").cast("long").as("id"),
        VectorExpressions.semDedupKey(col("embedding"), dim, bits).as("z"))
      .select(col("id"), col("z.u").as("u"), col("z.bucket").as("bucket"))
      .as[(Long, Seq[Long], Int)]
    keyed.groupByKey(_._3)
      .flatMapGroupsWithState[List[Array[Long]], SemVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket, rows, state: GroupState[List[Array[Long]]]) =>
          var kept = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[SemVerdict]
          rows.toIndexedSeq.sortBy(_._1).foreach { case (id, u, _) =>
            val uv = u.toArray
            val dup = kept.exists(k => SemDedup.dotFp(uv, k) >= tauFp)
            if (!dup) kept = uv :: kept
            out += SemVerdict(id, bucket, !dup)
          }
          state.update(kept)
          out.result().iterator
      }
  }
}
