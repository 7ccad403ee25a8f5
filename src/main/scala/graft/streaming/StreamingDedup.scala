package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A hashed stream document after the stream-static index join: the
  * static side's keeper id is null when the hash is absent from the
  * corpus index.
  */
final case class HashedDoc(docId: Long, h: String, indexDoc: Option[Long])

/** The incremental-dedup verdict row, identical to the batch
  * `TextQueries.probeExactIndex` schema.
  */
final case class DedupVerdict(doc_id: Long, verdict: String, dup_of: Option[Long])

/** Streaming incremental dedup: the ingestion-time arm of the
  * persisted-index probe. New documents arrive as a stream, the
  * corpus index is a STATIC table (stream-static left join — Spark
  * joins each micro-batch against it without state), and within-stream
  * duplicates resolve through `flatMapGroupsWithState` keyed on the
  * content hash: the first arrival of an unindexed hash is `unique`
  * and is remembered, every later arrival is `batch_dup` pointing at
  * it; indexed hashes are `corpus_dup` at any position.
  *
  * Semantics match the batch probe when documents arrive in doc-id
  * order (the batch keeper is min doc_id = first arrival) — the
  * differential spec feeds the same corpus split in multiple
  * micro-batches and compares byte-for-byte. State per hash is ONE
  * long (the keeper id): memory is bounded by distinct new hashes,
  * i.e. the data actually admitted, not the stream length.
  */
object StreamingDedup {

  def probeExactIndexStream(index: DataFrame, docStream: DataFrame): Dataset[DedupVerdict] = {
    val spark = docStream.sparkSession
    import spark.implicits._
    val hashed = docStream.select(col("doc_id").cast("long").as("docId"),
      md5(col("text")).as("h"))
    val joined = hashed
      .join(index.withColumnRenamed("index_doc", "indexDoc"), Seq("h"), "left")
      .select(col("docId"), col("h"), col("indexDoc").cast("long").as("indexDoc"))
      .as[HashedDoc]
    joined.groupByKey(_.h)
      .flatMapGroupsWithState[Long, DedupVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[Long]) =>
          // doc-id order inside the micro-batch: deterministic output
          // no matter how the shuffle interleaves arrivals
          val sorted = rows.toIndexedSeq.sortBy(_.docId)
          var keeper: Option[Long] = state.getOption
          val out = sorted.map { r =>
            r.indexDoc match {
              case Some(idx) => DedupVerdict(r.docId, "corpus_dup", Some(idx))
              case None => keeper match {
                case Some(f) => DedupVerdict(r.docId, "batch_dup", Some(f))
                case None =>
                  keeper = Some(r.docId)
                  DedupVerdict(r.docId, "unique", None)
              }
            }
          }
          keeper.foreach(f => if (!state.exists || state.get != f) state.update(f))
          out.iterator
      }
  }
}
