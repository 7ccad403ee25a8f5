package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ann.Similarity

/** One streamed query's ranked neighbor — identical schema to the
  * batch [[graft.ann.Similarity.ivfProbe]] output row.
  */
final case class AnnMatch(qid: Long, rnk: Int, nid: Long, cos: Double)

/** Streaming ANN probe: the online-retrieval arm of the persisted IVF
  * index. Query vectors arrive as a stream; the index (the
  * [[Similarity.ivfAssign]] cell table) and the corpus embeddings are
  * STATIC tables. Per micro-batch:
  *
  *   1. top-`nprobe` cells per query — the same codegen'd
  *      [[graft.functions.VectorExpressions.topCells]] kernel the
  *      batch path runs, with the trained centroids as plan literals;
  *   2. a stream-static equi-join on `cell` into the index's lists
  *      (the index is probed, never re-scanned per query — Spark joins
  *      each micro-batch against the static side without state);
  *   3. a stream-static equi-join on `nid` fetches candidate
  *      embeddings; the query embedding rides the stream row, so no
  *      second lookup is needed;
  *   4. per-query exact-cosine top-k inside `flatMapGroupsWithState`
  *      — STATELESS by construction (the state slot is never
  *      populated): stream-static joins never cross micro-batch
  *      boundaries, so every candidate for a query lands in the
  *      query's own batch and the group fold is a bounded in-memory
  *      top-k over ≤ the probed cells' occupancy.
  *
  * The cosine is the identical IEEE expression the batch re-rank
  * evaluates and ties break on `nid`, so the streamed rows equal the
  * batch `ivfProbe` BYTE-FOR-BYTE under any micro-batch chopping of
  * the query set (StreamingAnnSpec pins equality, not recall).
  */
object StreamingAnn {

  def ivfProbeStream(assign: DataFrame, vectors: DataFrame, queryStream: DataFrame,
                     cents: Seq[Seq[Double]], k: Int, nprobe: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): Dataset[AnnMatch] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val probes = queryStream.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      explode(graft.functions.VectorExpressions.topCells(col(vecCol), cents, nprobe))
        .as("cell"))
    val nSide = assign.join(
      vectors.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nid")
    val scored = probes.join(nSide, "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", Similarity.cosine(col("qvec"), col("nvec")))
      .select(col("qid").cast("long").as("_1"), col("nid").cast("long").as("_2"),
        col("cos").cast("double").as("_3"))
      .as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, AnnMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid, rows, _: GroupState[Boolean]) =>
          rows.toIndexedSeq
            .sortBy { case (_, nid, cos) => (-cos, nid) }
            .take(k).zipWithIndex
            .map { case ((_, nid, cos), i) => AnnMatch(qid, i + 1, nid, cos) }
            .iterator
      }
  }
}
