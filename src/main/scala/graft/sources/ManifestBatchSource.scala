package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.ManifestLog

/** The BATCH SQL face of a [[graft.operators.ManifestLog]] table — the
  * read AND write path for every non-Scala consumer (the Delta
  * `spark.read.format("delta").option("versionAsOf", …)` shape):
  *
  * {{{
  * spark.read.format("graft.sources.ManifestBatchSource")
  *   .option("path", dir)
  *   .option("versionAsOf", "3")        // or timestampAsOf
  *   .load()
  *   .createOrReplaceTempView("t")      // → plain SQL from here
  *
  * df.write.format("graft.sources.ManifestBatchSource")
  *   .option("path", dir)
  *   .option("statsCol", "doc_id")      // needed only for a NEW table
  *   .mode("append")                    // versioned append (or bootstrap)
  *   .save()                            // mode("overwrite") = versioned replace
  * }}}
  *
  * Writes go through the V1Write bridge into the EXISTING commit
  * machinery — range-clustered file writes, stats, constraint
  * enforcement, the pointer CAS with compose-on-conflict retries —
  * so a `df.write` append is byte-identical to [[ManifestLog.append]]
  * and `mode("overwrite")` is [[ManifestLog.replace]] (a new version
  * listing only the fresh files; older versions still time-travel).
  * The bridge hands the driver the whole DataFrame, which is exactly
  * where those operators start anyway — the heavy distributed write
  * inside them is Spark's own parquet path.
  *
  * Semantics are exactly [[ManifestLog.read]] / [[ManifestLog.readAsOf]]:
  * the chosen snapshot's file list, MOR deletion vectors APPLIED,
  * schema evolution aligned (added columns NULL on old files, widened
  * ints/floats promoted) — value-for-value parity is spec-pinned.
  *
  * Plan shape at scale: ONE input partition per live data file (plus
  * its dv pointer), so a 10k-file table reads with 10k-way
  * parallelism; each file's tombstone positions load once, executor-
  * side, from the deleted-row-sized DV batch — never a driver-side
  * anti-join. Options resolve on the DRIVER at `load()` (version
  * pinning is metadata), and the partition readers reuse the follow
  * source's aligning [[ManifestGroupRowReader]] with the session's
  * Hadoop configuration shipped along.
  *
  * `timestampAsOf` accepts epoch millis, `yyyy-MM-dd HH:mm:ss[.f]`
  * (session-zone-free SQL form) or ISO-8601 instants, mapped through
  * [[ManifestLog.versionAsOf]]'s monotone effective-timestamp rule.
  */
class ManifestBatchSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "manifest batch source needs a 'path' option")
    val spark = SparkSession.active
    ManifestLog.read(spark, path,
      ManifestBatchSource.resolveVersion(spark, path, options)).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    val spark = SparkSession.active
    new ManifestBatchTable(path,
      ManifestBatchSource.resolveVersion(spark, path, opts), schema,
      Option(opts.get("statsCol")),
      Option(opts.get("files")).map(_.toInt))
  }

  // writes hand their schema in from the incoming DataFrame — a fresh
  // table has nothing to infer against
  override def supportsExternalMetadata(): Boolean = true
}

object ManifestBatchSource {

  /** Convenience handle: `read(spark, dir)`, `read(spark, dir, versionAsOf = 3)`. */
  def read(spark: SparkSession, path: String, versionAsOf: Int = -1,
           timestampAsOf: String = null): DataFrame = {
    var r = spark.read.format(classOf[ManifestBatchSource].getName)
      .option("path", path)
    if (versionAsOf >= 1) r = r.option("versionAsOf", versionAsOf.toString)
    if (timestampAsOf != null) r = r.option("timestampAsOf", timestampAsOf)
    r.load()
  }

  private[sources] def resolveVersion(spark: SparkSession, path: String,
                                      opts: CaseInsensitiveStringMap): Int = {
    val v = Option(opts.get("versionAsOf"))
    val ts = Option(opts.get("timestampAsOf"))
    require(v.isEmpty || ts.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    v.map(_.toInt)
      .orElse(ts.map(s => ManifestLog.versionAsOf(spark, path, parseTsMillis(s))))
      .getOrElse(ManifestLog.currentVersion(spark, path))
  }

  private def parseTsMillis(s: String): Long =
    s.toLongOption.getOrElse {
      try java.sql.Timestamp.valueOf(s).getTime
      catch {
        case _: IllegalArgumentException => java.time.Instant.parse(s).toEpochMilli
      }
    }

  /** Planned-file count of the most recent batch scan — test-visible,
    * like ManifestLog.payloadReads, so specs can pin file skipping.
    */
  private[graft] val lastPlannedFiles = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Is `f` a range/equality predicate on the stats column with a
    * zone-map-comparable literal?
    */
  private[sources] def isKeyRangeFilter(f: org.apache.spark.sql.sources.Filter,
                                        key: String): Boolean = {
    import org.apache.spark.sql.sources._
    def comparable(v: Any): Boolean = v.isInstanceOf[Number] || v.isInstanceOf[String]
    f match {
      case EqualTo(a, v)            => a == key && comparable(v)
      case In(a, vs)                => a == key && vs.nonEmpty && vs.forall(comparable)
      case GreaterThan(a, v)        => a == key && comparable(v)
      case GreaterThanOrEqual(a, v) => a == key && comparable(v)
      case LessThan(a, v)           => a == key && comparable(v)
      case LessThanOrEqual(a, v)    => a == key && comparable(v)
      case _                        => false
    }
  }

  /** Widening comparison between a manifest bound and a filter
    * literal (same lattice as the manifest's own pruners).
    */
  private[sources] def cmpA(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long)       => java.lang.Long.compare(x, y)
    case (x: java.lang.Integer, y: java.lang.Integer) => Integer.compare(x, y)
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case _ => 0 // incomparable: never skip a file on it
  }
}

private[sources] class ManifestBatchTable(path: String, version: Int,
                                          schema0: StructType,
                                          statsColOpt: Option[String],
                                          filesOpt: Option[Int])
    extends Table with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty, "manifest batch source needs a 'path' option")

  override def name(): String = s"manifest($path@v$version)"
  override def schema(): StructType = schema0
  // BATCH_WRITE is what DataFrameWriter.save gates the V2 path on;
  // the V1Write returned below still routes to the V1-bridge exec
  // (the JDBC-connector discipline), and TRUNCATE admits
  // mode("overwrite") as truncate+append
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestBatchScanBuilder(path, version, schema0)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, legacyOverwrite: Boolean): Unit = {
              val spark = data.sparkSession
              val sc = statsColOpt
                .orElse(ManifestLog.statsColumn(spark, path))
                .getOrElse(throw new IllegalArgumentException(
                  s"writing a NEW manifest table at $path needs a 'statsCol' option " +
                    "(the range-clustering / upsert key column)"))
              if (overwrite || legacyOverwrite)
                ManifestLog.replace(data, sc, path, filesOpt.getOrElse(32))
              else if (ManifestLog.currentVersion(spark, path) == 0)
                ManifestLog.write(data, sc, path, filesOpt.getOrElse(32))
              else
                ManifestLog.append(data, sc, path, filesOpt.getOrElse(8))
            }
          }
      }
    }
}

/** Scan builder with the two scale levers a 100 TB table needs from
  * its SQL face:
  *
  *   - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the
  *     partition readers project each file to the requested columns
  *     by name (schema-evolution-safe), so a 2-column SELECT never
  *     decodes the other column chunks;
  *   - FILE SKIPPING ([[org.apache.spark.sql.connector.read.SupportsPushDownFilters]]):
  *     range/equality predicates on the table's stats column prune
  *     whole files against the snapshot's per-file lo/hi BEFORE any
  *     partition is planned — the manifest zone maps surfacing
  *     through `spark.read`/SQL exactly like the Scala
  *     [[ManifestLog.readPrunedAt]]. Every filter stays residual
  *     (Spark still evaluates rows); pruning only shrinks the file
  *     list, so correctness never depends on it.
  */
private[sources] class ManifestBatchScanBuilder(path: String, version: Int,
                                                full: StructType)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = full
  private var keyFilters: Array[Filter] = Array.empty
  private var key2Filters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(
      requiredSchema.fields.filter(f => full.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val spark = SparkSession.active
    val key = ManifestLog.statsColumn(spark, path)
    keyFilters = key
      .map(k => filters.filter(f => ManifestBatchSource.isKeyRangeFilter(f, k)))
      .getOrElse(Array.empty)
    // clustered tables carry a SECOND zone-map dimension (lo2/hi2) —
    // predicates on it skip files too (readPruned2's rule: a NULL
    // range survives, never skips)
    val key2 = ManifestLog.statsColumn2(spark, path)
    key2Filters = key2
      .map(k => filters.filter(f => ManifestBatchSource.isKeyRangeFilter(f, k)))
      .getOrElse(Array.empty)
    filters // all residual — file skipping only, rows still filtered by Spark
  }

  override def pushedFilters(): Array[Filter] = keyFilters ++ key2Filters

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def toBatch: Batch =
      new ManifestBatchScan(path, version, required, keyFilters, key2Filters)
    // surfaced in explain/plan strings so zone-map file skipping is
    // discoverable, not silent
    override def description(): String =
      s"manifest($path@v$version) PushedFilters: [${(keyFilters ++ key2Filters).mkString(", ")}]"
  }
}

private[sources] class ManifestBatchScan(path: String, version: Int,
                                         schema0: StructType,
                                         keyFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
                                         key2Filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Batch {
  import org.apache.spark.sql.sources._

  private def spark = SparkSession.active

  private def rangeSurvives(lo: Any, hi: Any, fs: Array[Filter]): Boolean =
    lo == null || hi == null || fs.forall {
      case EqualTo(_, v)            => ManifestBatchSource.cmpA(hi, v) >= 0 &&
                                       ManifestBatchSource.cmpA(lo, v) <= 0
      case In(_, vs)                => vs.exists(v =>
                                         ManifestBatchSource.cmpA(hi, v) >= 0 &&
                                         ManifestBatchSource.cmpA(lo, v) <= 0)
      case GreaterThan(_, v)        => ManifestBatchSource.cmpA(hi, v) > 0
      case GreaterThanOrEqual(_, v) => ManifestBatchSource.cmpA(hi, v) >= 0
      case LessThan(_, v)           => ManifestBatchSource.cmpA(lo, v) < 0
      case LessThanOrEqual(_, v)    => ManifestBatchSource.cmpA(lo, v) <= 0
      case _                        => true
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val snap = ManifestLog.snapshot(spark, path, version).collect()
    val kept = snap.filter { r =>
      rangeSurvives(r.get(1), r.get(2), keyFilters) &&
        rangeSurvives(if (r.isNullAt(5)) null else r.getLong(5),
          if (r.isNullAt(6)) null else r.getLong(6), key2Filters)
    }
    ManifestBatchSource.lastPlannedFiles.set(kept.length)
    kept.map(r => ManifestBatchPartition(r.getString(0), r.getString(4),
      schema0.json): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ManifestBatchReaderFactory(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
}

/** One live data file and its deletion-vector batch dir (null = none). */
case class ManifestBatchPartition(file: String, dv: String,
                                  schemaJson: String) extends InputPartition

case class ManifestBatchReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ManifestBatchPartition(file, dv, schemaJson) =
      partition.asInstanceOf[ManifestBatchPartition]
    val target = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new ManifestGroupRowReader(file, target, conf.value, -1, deadPositions(file, dv))
  }

  /** This file's tombstoned row indexes from its DV batch (executor-
    * side, deleted-row-sized). DV rows name files by the scan-time
    * `input_file_name()` URI, the snapshot by the commit-time path —
    * compare by filesystem path component, which both share.
    */
  private def deadPositions(file: String, dv: String): util.Set[java.lang.Long] = {
    if (dv == null) return null
    import org.apache.parquet.example.data.Group
    val filePath = new java.net.URI(file).getPath
    val dead = new util.HashSet[java.lang.Long]()
    val dvPath = new org.apache.hadoop.fs.Path(dv)
    val fs = dvPath.getFileSystem(conf.value)
    fs.listStatus(dvPath).iterator
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .foreach { s =>
        val r = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), s.getPath)
          .withConf(conf.value)
          .build()
        try {
          var g: Group = r.read()
          while (g != null) {
            val gt = g.getType
            val fIdx = gt.getFieldIndex("file")
            val pIdx = gt.getFieldIndex("pos")
            if (g.getFieldRepetitionCount(fIdx) > 0 &&
                g.getFieldRepetitionCount(pIdx) > 0) {
              val f = g.getBinary(fIdx, 0).toStringUsingUTF8
              if (new java.net.URI(f).getPath == filePath)
                dead.add(g.getLong(pIdx, 0))
            }
            g = r.read()
          }
        } finally r.close()
      }
    dead
  }
}
