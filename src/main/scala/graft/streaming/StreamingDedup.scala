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

/** A streamed document's best near-dup match in the corpus index. */
final case class MinhashMatch(doc_id: Long, dup_of: Long, est_jaccard: Double)

/** A streamed chunk after the stream-static chunk-index join. */
final case class ChunkProbe(docId: Long, idx: Int, h: String, indexDoc: Option[Long])

/** The chunk-granular incremental-dedup verdict row, identical to the
  * batch `TextQueries.probeChunkIndex` schema.
  */
final case class ChunkVerdict(doc_id: Long, idx: Int, verdict: String)

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

  /** Streaming NEAR-dup probe against a persisted MinHash index: each
    * streamed document's signature is a per-row expression (no
    * aggregation — [[graft.operators.TextQueries.minhashSignatureExpr]]),
    * its band keys inner-join the STATIC band index, candidates pick
    * up corpus signatures from the static signature table, and the
    * best match per document (highest estimated Jaccard ≥ the LSH
    * threshold, ties to the lowest corpus id — the batch probe's exact
    * rule) is emitted once. The whole probe is STATELESS per document
    * (a verdict depends only on the static index), so results are
    * identical under any micro-batch chopping; the
    * `flatMapGroupsWithState` at the end only folds one document's
    * candidate rows (which always share its micro-batch) into the
    * best row — its state is never read across batches.
    */
  def probeMinhashIndexStream(indexBands: DataFrame, indexSigs: DataFrame,
                              docStream: DataFrame): Dataset[MinhashMatch] = {
    import graft.operators.TextQueries
    val spark = docStream.sparkSession
    import spark.implicits._
    val sig = docStream
      .filter(size(graft.functions.TextExpressions.shingleHashes(col("text"), 3)) > 0)
      .select(col("doc_id").cast("long").as("a"),
        TextQueries.minhashSignatureExpr(col("text")).as("ma"))
    val bandRows = sig.select(col("a"), col("ma"),
        explode(array(TextQueries.minhashBandKeys(col("ma")).map { case (bi, k) =>
          struct(lit(bi).as("band"), k.as("bkey"))
        }: _*)).as("bb"))
      .select(col("a"), col("ma"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val scored = bandRows
      .join(indexBands.withColumnRenamed("doc_id", "b"), Seq("band", "bkey"))
      .join(indexSigs.select(col("doc_id").as("b"), col("mh").as("mb")), "b")
      .withColumn("est", TextQueries.minhashEstJaccard(col("ma"), col("mb")))
      .filter(col("est") >= TextQueries.JaccardT)
      .select(col("a"), col("b"), col("est")).as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[Long, MinhashMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (a, rows, _: GroupState[Long]) =>
          // candidates repeat across colliding bands; est is a function
          // of (a, b), so dedupe by b then take (max est, min b)
          val best = rows.toSeq.groupBy(_._2).view.mapValues(_.head._3).toSeq
            .sortBy { case (b, est) => (-est, b) }.head
          Iterator.single(MinhashMatch(a, best._1, best._2))
      }
  }

  /** Streaming CHUNK-granular incremental dedup: each arriving
    * document explodes into its 32-token chunks PER ROW (no
    * aggregation — [[graft.operators.TextQueries.chunkArrayExpr]] is
    * stream-safe), the chunk hashes stream-static-join the persisted
    * chunk index, and within-stream duplicates resolve through
    * `flatMapGroupsWithState` keyed on the chunk hash with the first
    * (doc, idx) arrival as the remembered keeper. Verdicts match the
    * batch [[graft.operators.TextQueries.probeChunkIndex]] when
    * documents arrive in doc-id order, under ANY micro-batch chopping;
    * state per chunk hash is one (long, int) keeper pair — bounded by
    * distinct NEW chunks, not stream length.
    */
  def probeChunkIndexStream(index: DataFrame, docStream: DataFrame): Dataset[ChunkVerdict] = {
    import graft.operators.TextQueries
    val spark = docStream.sparkSession
    import spark.implicits._
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val chunks = docStream
      .withColumn("toks", toks).filter(size(col("toks")) > 0)
      .select(col("doc_id").cast("long").as("docId"),
        posexplode(TextQueries.chunkArrayExpr(col("toks"))))
      .toDF("docId", "idx", "chunk")
      .withColumn("h", md5(col("chunk")))
    val joined = chunks
      .join(index.withColumnRenamed("index_doc", "indexDoc"), Seq("h"), "left")
      .select(col("docId"), col("idx"), col("h"),
        col("indexDoc").cast("long").as("indexDoc"))
      .as[ChunkProbe]
    joined.groupByKey(_.h)
      .flatMapGroupsWithState[(Long, Int), ChunkVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[(Long, Int)]) =>
          // (doc, idx) order inside the micro-batch: deterministic
          // under any shuffle interleaving
          val sorted = rows.toIndexedSeq.sortBy(r => (r.docId, r.idx))
          var keeper: Option[(Long, Int)] = state.getOption
          val out = sorted.map { r =>
            if (r.indexDoc.isDefined) ChunkVerdict(r.docId, r.idx, "corpus_dup")
            else keeper match {
              case Some(_) => ChunkVerdict(r.docId, r.idx, "batch_dup")
              case None =>
                keeper = Some((r.docId, r.idx))
                ChunkVerdict(r.docId, r.idx, "unique")
            }
          }
          keeper.foreach(f => if (!state.exists || state.get != f) state.update(f))
          out.iterator
      }
  }
}
