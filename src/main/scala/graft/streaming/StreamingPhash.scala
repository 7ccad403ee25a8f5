package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.AnnQueries

/** A streamed image's candidate corpus match after the stream-static
  * band join (None = no band collision at all).
  */
final case class PhashCand(docId: Long, cdoc: Option[Long], hamming: Option[Long])

/** The admission verdict, identical to the batch
  * [[graft.operators.AnnQueries.phashProbeIndex]] row shape.
  */
final case class PhashVerdict(doc_id: Long, status: String,
                              dup_of: Option[Long], hamming: Option[Long])

/** Streaming perceptual-hash admission — the ingestion-time arm of
  * [[AnnQueries.phashProbeIndex]], completing the image-dedup family
  * (batch pairs → incremental index probe → streaming admission, the
  * same ladder the exact/MinHash/chunk/semantic dedups climb):
  *
  *   - each arriving image's 64-bit dHash is computed PER ROW by the
  *     real BMP pixel walk (`mapPartitions` — stream-safe, no
  *     aggregation);
  *   - its 8×8 band keys LEFT-join the STATIC code index (stream-static
  *     join: every micro-batch probes the index without state; Spark
  *     broadcasts the banded index when it is small, and at corpus
  *     scale the join shuffles only the micro-batch side);
  *   - `flatMapGroupsWithState` keyed on the document folds its
  *     candidate rows (always within one micro-batch) into ONE
  *     verdict: best (lowest Hamming, then lowest corpus id) within
  *     the threshold → 'dup', else 'fresh'.
  *
  * A verdict depends only on the static index — the operator holds no
  * cross-batch state — so output is IDENTICAL under any micro-batch
  * chopping (the differential spec pins 1-wave == 3-wave == batch).
  */
object StreamingPhash {

  def probeIndexStream(index: DataFrame, imgStream: DataFrame): Dataset[PhashVerdict] = {
    val spark = imgStream.sparkSession
    import spark.implicits._
    val hashed = graft.multimodal.Multimodal.bmpDHash(imgStream, "bin", "doc_id")
    val cands = AnnQueries.phashBanded(hashed, "bdoc", "bph")
      .join(AnnQueries.phashBanded(index, "cdoc", "cph"), Seq("band", "bkey"), "left")
      .select(col("bdoc").as("docId"), col("cdoc"),
        when(col("cdoc").isNotNull,
          graft.functions.VectorExpressions.codeHamming(
            array(col("bph")), array(col("cph"))).cast("long")).as("hamming"))
      .as[PhashCand]
    cands.groupByKey(_.docId)
      .flatMapGroupsWithState[Long, PhashVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (docId, rows, _: GroupState[Long]) =>
          // candidates repeat across colliding bands with identical
          // (cdoc, hamming); the (hamming, cdoc) min is unaffected
          val best = rows.toSeq
            .flatMap(r => for (c <- r.cdoc; h <- r.hamming
              if h <= AnnQueries.MmPhashHammingT) yield (h, c))
            .minOption
          Iterator.single(best match {
            case Some((h, c)) => PhashVerdict(docId, "dup", Some(c), Some(h))
            case None         => PhashVerdict(docId, "fresh", None, None)
          })
      }
  }
}
