package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** A streamed document's gram after the stream-static index join. */
final case class GramProbe(docId: Long, gram: String, known: Boolean)

/** The per-document novelty row, identical to the batch
  * `text_novelty` schema.
  */
final case class NoveltyRow(doc_id: Long, n_grams: Long, n_novel: Long,
                            novelty: Double)

/** Streaming n-gram novelty screen: the ingestion-time arm of
  * `text_novelty` (what fraction of an arriving document's distinct
  * 3-grams the corpus has never seen). The corpus gram set is a
  * STATIC table — each arriving document's distinct grams are a
  * per-row expression (`array_distinct` over the shingle array, no
  * stream aggregation), exploded and left-joined against it, and the
  * per-document fold runs in `flatMapGroupsWithState` with NO state
  * read across batches: one document's gram rows always share its
  * micro-batch, so the verdict is a pure function of (document,
  * static index) and results are identical under any micro-batch
  * chopping or restart. Documents with fewer than 3 tokens have no
  * grams and emit nothing — the batch query's explode drops them the
  * same way.
  */
object StreamingNovelty {

  /** The corpus side: distinct 3-grams, one column `gram`. NOTE —
    * Spark re-executes the static side of a stream-static join on
    * EVERY micro-batch, so pass [[noveltyStream]] a MATERIALIZED
    * index (parquet-backed, like the dedup corpus indexes, or
    * cached), not this raw plan: materialized, each batch pays an
    * index scan; raw, it would pay the full corpus re-tokenize +
    * distinct shuffle per batch. The spec pins the parquet
    * round-trip.
    */
  def buildGramIndex(corpus: DataFrame): DataFrame =
    corpus.select(explode(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)).as("gram"))
      .distinct()

  def noveltyStream(gramIndex: DataFrame, docStream: DataFrame): Dataset[NoveltyRow] = {
    val spark = docStream.sparkSession
    import spark.implicits._
    val grams = docStream
      .withColumn("g", array_distinct(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)))
      .filter(size(col("g")) > 0)
      .select(col("doc_id").cast("long").as("docId"), explode(col("g")).as("gram"))
    val joined = grams
      .join(gramIndex.withColumn("known", lit(true)), Seq("gram"), "left")
      .select(col("docId"), col("gram"),
        coalesce(col("known"), lit(false)).as("known"))
      .as[GramProbe]
    joined.groupByKey(_.docId)
      .flatMapGroupsWithState[Long, NoveltyRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (docId, rows, _: GroupState[Long]) =>
          var n = 0L
          var novel = 0L
          rows.foreach { r => n += 1; if (!r.known) novel += 1 }
          // the batch query's exact arithmetic: double(novel) / n
          Iterator.single(NoveltyRow(docId, n, novel, novel.toDouble / n))
      }
  }
}
