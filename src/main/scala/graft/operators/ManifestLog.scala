package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned zone-map manifests: snapshot isolation and time travel
  * for manifest-tracked parquet tables — the lakehouse transaction-log
  * core (Delta/Iceberg snapshots) reduced to its data-skipping
  * essence, on vanilla parquet.
  *
  * Layout: data files land flat under `path` (append-only; a writer
  * never mutates an existing data file), and every table MUTATION
  * (initial write, append, compaction) writes one SNAPSHOT —
  * `path/_mlog/v%05d` — holding the full (file, lo, hi, rows) stats
  * list of exactly the files live at that version. Readers resolve a
  * snapshot FIRST and read only its file list, never the directory:
  *  - a reader pinned at version N is untouched by later appends AND
  *    by compaction rewrites (old files stay on disk until vacuum);
  *  - the latest version is always a consistent view — a crashed
  *    append leaves orphan data files that no snapshot references
  *    (invisible to every reader, reclaimed by vacuum), never a
  *    half-visible table.
  * `vacuum(retain)` deletes data files referenced by NO retained
  * snapshot plus the expired snapshots themselves — the only
  * destructive operation, explicitly deferred like Delta's VACUUM.
  *
  * Single-writer cadence (like [[LayoutOps.appendWithManifest]]);
  * snapshots are kilobytes at any table size, so every planning
  * decision here is driver-side metadata work.
  */
object ManifestLog {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = s"$path/_mlog"

  private def vDir(path: String, v: Int) = f"${logDir(path)}/v$v%05d"

  /** All snapshot versions present, ascending (empty = no table). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(logDir(path))
    val f = fs(spark, path)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).iterator
      .filter(_.isDirectory)
      .flatMap(s => "^v(\\d{5})$".r.findFirstMatchIn(s.getPath.getName).map(_.group(1).toInt))
      .toSeq.sorted
  }

  def currentVersion(spark: SparkSession, path: String): Int =
    versions(spark, path).lastOption.getOrElse(0)

  /** The stats snapshot at `version` (−1 = latest): one row per live
    * data file, (file, lo, hi, rows).
    */
  def snapshot(spark: SparkSession, path: String, version: Int = -1): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, path)
    require(v > 0, s"no snapshots under $path")
    spark.read.parquet(vDir(path, v)).select("file", "lo", "hi", "rows")
  }

  private def writeSnapshot(spark: SparkSession, path: String, v: Int,
                            rows: Seq[org.apache.spark.sql.Row],
                            schema: org.apache.spark.sql.types.StructType): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.mode("overwrite").parquet(vDir(path, v))

  private def statsOf(spark: SparkSession, files: Seq[String], statsCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("lo"), max(col(statsCol)).as("hi"),
        count(lit(1)).as("rows"))
  }

  private def listDataFiles(spark: SparkSession, path: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) return Set.empty
    f.listStatus(p).iterator
      .filter(_.isFile)
      .map(_.getPath)
      .filter(n => !n.getName.startsWith("_") && !n.getName.startsWith("."))
      .map(_.toUri.toString)
      .toSet
  }

  /** Initial load: range-clustered data files + snapshot v1. */
  def write(df: DataFrame, statsCol: String, path: String, files: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    df.repartitionByRange(files, col(statsCol))
      .sortWithinPartitions(statsCol)
      .write.mode("overwrite").parquet(path)
    val st = statsOf(spark, listDataFiles(spark, path).toSeq.sorted, statsCol)
    writeSnapshot(spark, path, 1, st.collect().toSeq, st.schema)
  }

  /** Append a batch: new data files + snapshot v+1 = old ∪ new. A
    * reader at v is unaffected; the append becomes visible atomically
    * when its snapshot lands.
    */
  def append(df: DataFrame, statsCol: String, path: String, files: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val v = currentVersion(spark, path)
    require(v > 0, s"append before write at $path")
    val old = snapshot(spark, path, v).collect().toSeq
    val before = listDataFiles(spark, path)
    df.repartitionByRange(files, col(statsCol))
      .sortWithinPartitions(statsCol)
      .write.mode("append").parquet(path)
    val fresh = (listDataFiles(spark, path) -- before).toSeq.sorted
    val st = statsOf(spark, fresh, statsCol)
    writeSnapshot(spark, path, v + 1, old ++ st.collect(), st.schema)
  }

  /** Compact the current version's sub-target files into
    * range-clustered outputs — snapshot v+1 swaps the small files for
    * the repacked ones, but the ORIGINALS STAY ON DISK so every older
    * snapshot still resolves ([[vacuum]] reclaims them). Returns
    * (#files compacted away, #files written).
    */
  def compact(spark: SparkSession, path: String, statsCol: String,
              targetRows: Long): (Int, Int) = {
    import org.apache.spark.sql.functions._
    val v = currentVersion(spark, path)
    require(v > 0, s"compact before write at $path")
    val cur = snapshot(spark, path, v)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    val (small, keep) = cur.partition(_._2 < targetRows)
    if (small.size <= 1) return (0, 0)
    val total = small.map(_._2).sum
    val nOut = math.max(1L, (total + targetRows - 1) / targetRows).toInt
    val keptRows = snapshot(spark, path, v)
      .filter(org.apache.spark.sql.functions.col("file")
        .isin(keep.map(_._1): _*)).collect().toSeq
    val before = listDataFiles(spark, path)
    spark.read.parquet(small.map(_._1): _*)
      .repartitionByRange(nOut, col(statsCol))
      .sortWithinPartitions(statsCol)
      .write.mode("append").parquet(path)
    val fresh = (listDataFiles(spark, path) -- before).toSeq.sorted
    val st = statsOf(spark, fresh, statsCol)
    writeSnapshot(spark, path, v + 1, keptRows ++ st.collect(), st.schema)
    (small.size, fresh.size)
  }

  /** Copy-on-write MERGE (upsert by `statsCol` as the key): rows of
    * `updates` replace every same-key row; new keys are inserted. Only
    * data files whose [lo, hi] stats range CONTAINS at least one
    * update key are rewritten — affected files are found by joining
    * the update keys against the BROADCAST snapshot stats (one pass
    * over the updates, no key collect) — and the untouched majority of
    * the table carries into snapshot v+1 by reference. At 100 TB a
    * daily upsert rewrites the handful of range-clustered files its
    * keys land in, never the table; a reader pinned at v still sees
    * the pre-merge rows (old files stay until [[vacuum]]). Returns
    * (#files rewritten, #files carried untouched).
    */
  def merge(updates: DataFrame, statsCol: String, path: String,
            files: Int = 8): (Int, Int) = {
    import org.apache.spark.sql.functions._
    val spark = updates.sparkSession
    val v = currentVersion(spark, path)
    require(v > 0, s"merge before write at $path")
    val snapRows = snapshot(spark, path, v).collect().toSeq
    // empty batch: no rewrite, no new version (the compact() guard's
    // analogue — otherwise statsOf would read zero paths and throw)
    if (updates.isEmpty) return (0, snapRows.size)
    val statsDf = snapshot(spark, path, v)
    val affected = updates.select(col(statsCol).as("__k")).distinct()
      .join(broadcast(statsDf),
        col("__k") >= col("lo") && col("__k") <= col("hi"))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val (touch, keep) = snapRows.partition(r => affected(r.getString(0)))
    val keys = updates.select(col(statsCol)).distinct()
    val out =
      if (touch.isEmpty) updates
      else spark.read.parquet(touch.map(_.getString(0)): _*)
        .join(keys, Seq(statsCol), "left_anti")
        .unionByName(updates)
    val before = listDataFiles(spark, path)
    out.repartitionByRange(files, col(statsCol))
      .sortWithinPartitions(statsCol)
      .write.mode("append").parquet(path)
    val fresh = (listDataFiles(spark, path) -- before).toSeq.sorted
    val st = statsOf(spark, fresh, statsCol)
    writeSnapshot(spark, path, v + 1, keep ++ st.collect(), st.schema)
    (touch.size, keep.size)
  }

  /** Change-data-capture between two versions: (added, removed) row
    * frames. Data files are immutable, so rows can only change by file
    * replacement — the diff scans ONLY the symmetric difference of the
    * two file lists (a merge that rewrote 2 of 500 files diffs by
    * reading ~4 files, not the table) and resolves row-level identity
    * with two EXCEPT-ALL passes over those files. Multiset semantics:
    * duplicate rows count, a row moved between files cancels out.
    */
  def diff(spark: SparkSession, path: String, vFrom: Int,
           vTo: Int): (DataFrame, DataFrame) = {
    // explicit versions only — snapshot()'s v<=0 latest-fallback would
    // silently diff the wrong pair
    require(vFrom >= 1 && vTo >= 1, s"diff needs explicit versions, got $vFrom -> $vTo")
    def fileSet(v: Int) =
      snapshot(spark, path, v).collect().map(_.getString(0)).toSet
    val from = fileSet(vFrom)
    val to = fileSet(vTo)
    val onlyFrom = (from -- to).toSeq.sorted
    val onlyTo = (to -- from).toSeq.sorted
    def readOr(files: Seq[String], like: Seq[String]): DataFrame =
      if (files.nonEmpty) spark.read.parquet(files: _*)
      else spark.read.parquet(like: _*)
        .filter(org.apache.spark.sql.functions.lit(false))
    val oldRows = readOr(onlyFrom, (from ++ to).toSeq.sorted)
    val newRows = readOr(onlyTo, (from ++ to).toSeq.sorted)
    (newRows.exceptAll(oldRows), oldRows.exceptAll(newRows))
  }

  /** Scan `statsCol ∈ [lo, hi]` AT a version (−1 = latest): zone-map
    * pruning inside the snapshot's file list, residual filter on top —
    * results equal a plain scan of exactly that version's files.
    * Returns (frame, surviving files, total files in the snapshot).
    */
  def readPrunedAt(spark: SparkSession, path: String, statsCol: String,
                   lo: Any, hi: Any, version: Int = -1): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val snap = snapshot(spark, path, version).collect()
    val survivors = snap.filter { r =>
      val flo = r.get(1); val fhi = r.get(2)
      cmp(fhi, lo) >= 0 && cmp(flo, hi) <= 0
    }.map(_.getString(0)).toSeq.sorted
    val df =
      if (survivors.isEmpty)
        spark.read.parquet(snap.map(_.getString(0)).toSeq: _*)
          .filter(lit(false))
      else spark.read.parquet(survivors: _*)
        .filter(col(statsCol).between(lit(lo), lit(hi)))
    (df, survivors.size, snap.length)
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)       => Integer.compare(x, y)
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(s"incomparable manifest bounds: $a vs $b")
  }

  /** Reclaim: keep the newest `retain` snapshots, delete every data
    * file referenced by NONE of them (including crashed-append
    * orphans no snapshot ever saw) and the expired snapshot dirs.
    * Returns the number of data files deleted.
    */
  def vacuum(spark: SparkSession, path: String, retain: Int = 1): Int = {
    require(retain >= 1, "must retain at least the latest snapshot")
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshots under $path")
    val keepVs = vs.takeRight(retain)
    val live: Set[String] = keepVs.flatMap { v =>
      snapshot(spark, path, v).collect().map(_.getString(0))
    }.toSet
    val f = fs(spark, path)
    val dead = (listDataFiles(spark, path) -- live).toSeq.sorted
    dead.foreach(d => f.delete(new org.apache.hadoop.fs.Path(new java.net.URI(d)), false))
    vs.dropRight(retain).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(vDir(path, v)), true)
    }
    dead.size
  }
}
