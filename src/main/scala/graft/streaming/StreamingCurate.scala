package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ManifestLog, TextQueries}

/** Incremental curation ADMISSION: `pipeline_curate_e2e` as a
  * streaming cadence. Each micro-batch wave of crawled documents is
  *   1. screened with the batch pipeline's byte-identical expressions
  *      ([[TextQueries.curateScreened]]: lang → integer quality →
  *      blocklist → content hash),
  *   2. keep-first deduplicated WITHIN the wave (min doc_id per hash),
  *   3. probed against the PERSISTED exact-dedup hash index (one
  *      left-anti join — the incremental-dedup discipline: the
  *      already-admitted corpus is never re-screened),
  *   4. split-assigned leakage-consistently from the keeper id
  *      ([[TextQueries.curateSplit]] — admitted docs ARE keepers under
  *      doc-id-ordered arrival, the same requirement as every
  *      streaming-dedup differential),
  *   5. admitted into a [[ManifestLog]] table via MERGE (upsert by
  *      doc_id), and only then recorded in the hash index.
  *
  * CRASH CONSISTENCY — why merge-then-index in that order: foreachBatch
  * is at-least-once, so a wave can replay after a kill. Whatever the
  * crash point, the replay converges:
  *   - crash before the merge: the replay redoes everything;
  *   - crash between merge and index append: the replay's index probe
  *     re-admits the same rows and the MERGE upserts them by key —
  *     content-idempotent, no duplicate manifest rows (an APPEND here
  *     would double-count, which is exactly why admission upserts);
  *   - crash after both: the replay's probe finds every hash indexed,
  *     admits nothing, touches nothing.
  * StreamingCurateSpec pins the differential: the final manifest
  * rollup equals the BATCH `pipeline_curate_e2e` over the union of all
  * waves, across a kill/restart between waves.
  *
  * Scale shape: per wave the work is wave-sized (screens fuse into the
  * wave scan) plus one left-anti join against the index — at 100 TB
  * the index is the hash column only (~32 B/doc), itself a candidate
  * for the bucketed layout so the anti-join stays exchange-free on the
  * index side. The manifest merge rewrites only the key-overlapping
  * files (none, for monotone doc ids — appends in practice).
  */
object StreamingCurate {

  /** The admission probe for one wave: the screened keep-first keepers
    * NOT yet in the persisted hash index. Probe discipline matches the
    * incremental-dedup indexes (IncrementalDedupSpec's contract): the
    * wave's distinct hashes BROADCAST into ONE index scan (inner join
    * — the corpus-sized side is scanned once and shuffled never), and
    * the wave-bounded hit list broadcasts back into the wave-sized
    * anti-join. The naive `wave LEFT ANTI index` would shuffle the
    * whole index every wave at scale: left-anti can only broadcast
    * its RIGHT side, and the index is the big one.
    * StreamingCurateSpec pins the plan: no index file scan under a
    * ShuffleExchange.
    */
  def probeFresh(wave: DataFrame, indexDir: String): DataFrame = {
    val spark = wave.sparkSession
    val screened = TextQueries.curateScreened(wave)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__h")
    val keepers = screened
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
    if (!indexExists(spark, indexDir)) keepers
    else {
      // no distinct on hits: it would put a shuffle ABOVE the index
      // scan, and duplicate hit rows (a replayed wave's re-appended
      // index entries) are harmless to an anti-join — the broadcast
      // stays wave-bounded either way
      val hits = spark.read.parquet(indexDir).select(col("h").as("__h"))
        .join(broadcast(keepers.select("__h").distinct()), Seq("__h"))
      keepers.join(broadcast(hits), Seq("__h"), "left_anti")
    }
  }

  /** [[probeFresh]] against a BUCKETED hash index (the scaladoc's own
    * scale candidate, landed): the index is a catalog table written
    * through `bucketBy(h)`, so the hit-detection join is a
    * SortMergeJoin whose index side reads bucket-aligned with ZERO
    * exchange — only the wave's hashes shuffle (wave-sized, any wave
    * size). This removes [[probeFresh]]'s one scale assumption: the
    * broadcast-into-scan probe needs the WAVE to be broadcastable,
    * which a backfill wave isn't — the bucketed shape shuffles the
    * wave instead of broadcasting it and still never moves the index.
    * StreamingCurateSpec pins the plan (index scan `Bucketed: true`,
    * no exchange above it below the join).
    */
  def probeFreshBucketed(wave: DataFrame, indexTable: String): DataFrame = {
    val spark = wave.sparkSession
    val screened = TextQueries.curateScreened(wave)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__h")
    val keepers = screened
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
    if (!spark.catalog.tableExists(indexTable)) keepers
    else {
      // force the merge join so the bucket spec (not a broadcast)
      // carries the index side; the hit list is wave-bounded and
      // broadcasts back into the wave-sized anti-join
      val hits = spark.table(indexTable).select(col("h").as("__h"))
        .hint("merge")
        .join(keepers.select("__h").distinct(), Seq("__h"))
      keepers.join(broadcast(hits), Seq("__h"), "left_anti")
    }
  }

  /** [[admitWave]] with the bucketed index: identical merge-then-index
    * crash ordering and convergence argument; the index append goes
    * through the catalog so every wave's files land bucket-aligned
    * under the same spec.
    */
  def admitWaveBucketed(wave: DataFrame, manifestPath: String,
                        indexTable: String, indexPath: String,
                        buckets: Int = 8): Unit = {
    val spark = wave.sparkSession
    val admitted = probeFreshBucketed(wave, indexTable)
      .withColumn("split", TextQueries.curateSplit(col("keeper")))
      .select(col("doc_id"), col("__h").as("h"), col("source"),
        col("split"), col("n_tokens"))
      .persist()
    try {
      if (!admitted.isEmpty) {
        if (ManifestLog.versions(spark, manifestPath).isEmpty)
          ManifestLog.write(admitted, "doc_id", manifestPath, files = 4)
        else
          ManifestLog.merge(admitted, "doc_id", manifestPath, files = 4)
        var wr = admitted.select(col("h"), col("doc_id").as("index_doc"))
          .write.mode("append").format("parquet")
          .bucketBy(buckets, "h").sortBy("h")
        if (!spark.catalog.tableExists(indexTable))
          wr = wr.option("path", indexPath)
        wr.saveAsTable(indexTable)
      }
    } finally admitted.unpersist()
  }

  /** Admit one wave. Safe to call from a foreachBatch sink; also the
    * direct batch-mode entry the differential spec drives.
    */
  def admitWave(wave: DataFrame, manifestPath: String, indexDir: String): Unit = {
    val spark = wave.sparkSession
    val admitted = probeFresh(wave, indexDir)
      .withColumn("split", TextQueries.curateSplit(col("keeper")))
      .select(col("doc_id"), col("__h").as("h"), col("source"),
        col("split"), col("n_tokens"))
      // several consumers below (emptiness, merge's own multi-pass,
      // the index append) — pin one evaluation
      .persist()
    try {
      if (!admitted.isEmpty) {
        if (ManifestLog.versions(spark, manifestPath).isEmpty)
          ManifestLog.write(admitted, "doc_id", manifestPath, files = 4)
        else
          ManifestLog.merge(admitted, "doc_id", manifestPath, files = 4)
        admitted.select(col("h"), col("doc_id").as("index_doc"))
          .write.mode("append").parquet(indexDir)
      }
    } finally admitted.unpersist()
  }

  /** The final training manifest of an admission table: the same
    * (split, source, n_docs, n_tokens) rollup the batch pipeline
    * emits, read from the ManifestLog head snapshot.
    */
  def manifestRollup(spark: SparkSession, manifestPath: String): DataFrame = {
    val files = ManifestLog.snapshot(spark, manifestPath)
      .collect().map(_.getString(0)).toSeq.sorted
    spark.read.parquet(files: _*)
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("split", "source")
  }

  private def indexExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.exists(p) && f.listStatus(p).exists(s => !s.getPath.getName.startsWith("_"))
  }
}
