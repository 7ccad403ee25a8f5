package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.ManifestLog

/** A [[graft.operators.ManifestLog]] table as a REAL Structured
  * Streaming source (the Delta-streaming-source shape, as DataSourceV2
  * `MicroBatchStream`) — the piece that lets manifest tables feed the
  * engine's own streaming arms instead of a driver-side foreachBatch
  * tailer:
  *
  *   - the streaming OFFSET IS the snapshot version, checkpointed
  *     through Spark's WAL — exactly-once with transactional sinks
  *     comes from the same determinism the batch [[ManifestLog.follow]]
  *     argues: snapshots are immutable, so a replayed (start, end]
  *     version range plans byte-identical partitions;
  *   - `planInputPartitions` enforces the SAME non-append contract as
  *     `follow`: a version that REMOVES files (compact/merge/COW
  *     delete) THROWS in strict mode (default, the Delta-source
  *     default) naming the version, or is skipped wholesale with
  *     `skipRewrites=true` (rewritten data never re-delivers; rows a
  *     merge inserted are skipped with it — Delta's ignoreChanges);
  *     a MOR-delete version (dv pointers moved) ALSO throws in strict
  *     mode — it deleted rows this append-only source can never
  *     surface, and Delta's source likewise errors on change commits
  *     unless opted out — with `ignoreDeletes=true` (Delta's option
  *     name) consuming it silently; restore-to-same and other no-op
  *     versions plan nothing;
  *   - version deltas come from [[ManifestLog.followDeltas]], so a
  *     rewound replay of a long-lived table reads the log CHECKPOINT
  *     plus O(interval) payloads, never the whole chain;
  *   - each added file is ONE input partition (appends are written
  *     range-clustered across `files` partitions, so a batch
  *     parallelizes), read by a plain parquet row walk with add-column
  *     / int-widening alignment to the declared schema; every row
  *     carries `_commit_version` — the idempotent-sink key a
  *     downstream MERGE wants.
  *
  * Scope (documented, loudly enforced): added files carrying a
  * deletion vector at their add version do not occur under the
  * append-only contract this source admits (DVs arrive via `dvmove`
  * on EXISTING files — a metadata-only version); if one is ever seen
  * the plan throws rather than resurrecting dead rows. Column types
  * cover the manifest tables' surface (bool/int/long/float/double/
  * string/binary/date/timestamp, plus LIST-annotated arrays of
  * primitives — the embedding-column shape); other nested types throw.
  *
  * Usage: `spark.readStream.format(classOf[ManifestFollowSource].getName)
  * .option("path", dir).option("fromVersion", "1").load()` or
  * [[ManifestFollowSource.stream]].
  *
  * LAG TOLERANCE mirrors [[ManifestLog.follow]]: a stream whose
  * checkpointed offset falls behind the table's vacuum horizon gets
  * the named restart-from-a-fresh-checkpoint error (vacuum compresses
  * expired versions' checkpoint deltas to `truncated` markers) — keep
  * trigger cadence within the table's vacuum retention, the Kafka
  * retention-window discipline.
  */
class ManifestFollowSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "manifest-follow source needs a 'path' option")
    ManifestFollowSource.readSchemaOf(SparkSession.active, path)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ManifestFollowTable(
      opts.get("path"),
      Option(opts.get("skipRewrites")).exists(_.toBoolean),
      Option(opts.get("ignoreDeletes")).exists(_.toBoolean),
      Option(opts.get("fromVersion")).map(_.toInt).getOrElse(-1),
      Option(opts.get("maxVersionsPerTrigger")).map(_.toInt).getOrElse(0),
      schema)
  }
}

object ManifestFollowSource {

  /** The column stamping each row with the version that appended it. */
  val VersionCol = "_commit_version"

  private[sources] def readSchemaOf(spark: SparkSession, path: String): StructType = {
    val base = ManifestLog.read(spark, path).schema
    StructType(base.fields :+ StructField(VersionCol, IntegerType, nullable = false))
  }

  /** Convenience handle mirroring [[IngestSources]]' helpers. */
  def stream(spark: SparkSession, path: String,
             skipRewrites: Boolean = false, fromVersion: Int = -1,
             maxVersionsPerTrigger: Int = 0,
             ignoreDeletes: Boolean = false): DataFrame = {
    var r = spark.readStream.format(classOf[ManifestFollowSource].getName)
      .option("path", path)
      .option("skipRewrites", skipRewrites.toString)
      .option("ignoreDeletes", ignoreDeletes.toString)
    if (fromVersion >= 1) r = r.option("fromVersion", fromVersion.toString)
    if (maxVersionsPerTrigger > 0)
      r = r.option("maxVersionsPerTrigger", maxVersionsPerTrigger.toString)
    r.load()
  }
}

/** A java-serializable Hadoop `Configuration` (the Writable protocol
  * over object streams — the standard connector discipline): the
  * executor-side parquet readers must see the SESSION's effective
  * Hadoop configuration (`spark.hadoop.*` keys, credentials, custom
  * filesystem impls), not a bare `new Configuration()` that only ever
  * resolves the default local filesystem.
  */
private[sources] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private[sources] class ManifestFollowTable(path: String, skipRewrites: Boolean,
                                           ignoreDeletes: Boolean,
                                           fromVersion: Int, maxVersions: Int,
                                           schema0: StructType)
    extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "manifest-follow source needs a 'path' option")

  override def name(): String = s"manifest-follow($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ManifestFollowStream(path, skipRewrites, ignoreDeletes,
            fromVersion, maxVersions, schema0)
      }
    }
}

/** The snapshot version as the streaming offset. */
case class ManifestVersionOffset(version: Int) extends Offset {
  override def json: String = s"""{"version":$version}"""
}

private[sources] class ManifestFollowStream(path: String, skipRewrites: Boolean,
                                            ignoreDeletes: Boolean,
                                            fromVersion: Int, maxVersions: Int,
                                            readSchema: StructType)
    extends MicroBatchStream {

  private def spark = SparkSession.active

  // high-water of handed-out offsets, so the per-trigger admission cap
  // advances from the last batch's end even before its commit lands
  @volatile private var highWater = -1

  override def initialOffset(): Offset = {
    val v = if (fromVersion >= 1) fromVersion - 1
      else ManifestLog.currentVersion(spark, path)
    highWater = math.max(highWater, v)
    ManifestVersionOffset(v)
  }

  override def latestOffset(): Offset = {
    // maxVersionsPerTrigger (0 = unbounded) bounds one micro-batch's
    // admission — a consumer rewound to v1 of a 10k-version table
    // drains in bounded slices instead of planning one giant batch,
    // the same backpressure face as the tail source's byte budget.
    // Self-seed: on a fresh query Spark asks for the latest offset
    // BEFORE the initial one, and on restart the WAL's
    // deserializeOffset has already bumped the high-water.
    if (highWater < 0) initialOffset()
    val head = ManifestLog.currentVersion(spark, path)
    val cap =
      if (maxVersions > 0 && highWater >= 0) math.min(head, highWater + maxVersions)
      else head
    highWater = math.max(highWater, cap)
    ManifestVersionOffset(cap)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """"version"\s*:\s*(\d+)""".r
    val v = m.findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(0)
    highWater = math.max(highWater, v)
    ManifestVersionOffset(v)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ManifestVersionOffset].version
    val e = end.asInstanceOf[ManifestVersionOffset].version
    ManifestLog.followDeltas(spark, path, s, e).flatMap {
      case (v, removedCount, _, _) if removedCount > 0 && !skipRewrites =>
        throw new IllegalStateException(
          s"manifest-follow($path) hit a non-append commit at v$v ($removedCount files " +
            "rewritten); restart from a fresh checkpoint or set skipRewrites=true " +
            "(rewritten data will not re-deliver)")
      case (_, removedCount, _, _) if removedCount > 0 => Seq.empty // skipRewrites
      case (v, _, dvMoved, _) if dvMoved > 0 && !skipRewrites && !ignoreDeletes =>
        throw new IllegalStateException(
          s"manifest-follow($path) hit a MOR delete at v$v ($dvMoved deletion-vector " +
            "pointers moved); this append-only source can never surface the deletions — " +
            "set ignoreDeletes=true to consume past it, or restart from a fresh checkpoint")
      case (v, _, _, added) => added.map { case (file, dv) =>
        if (dv != null) throw new IllegalStateException(
          s"manifest-follow($path) v$v added file $file WITH a deletion vector — " +
            "outside the append-only contract; use ManifestLog.follow for this table")
        ManifestFilePartition(file, v, readSchema.json)
      }
    }.toArray
  }

  // the session's effective Hadoop conf is captured ON THE DRIVER at
  // stream start and shipped once per scan inside the factory — the
  // executor readers must open parquet through the same credentials /
  // endpoints / fs impls the driver planned with (a bare
  // `new Configuration()` silently pins the source to the default FS)
  override def createReaderFactory(): PartitionReaderFactory =
    ManifestFollowReaderFactory(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One appended parquet file at its appending version. The target
  * schema rides along as JSON so the executor-side reader can align
  * the file's own (possibly older/narrower) schema to it.
  */
case class ManifestFilePartition(file: String, version: Int,
                                 schemaJson: String) extends InputPartition

case class ManifestFollowReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ManifestFilePartition(file, version, schemaJson) =
      partition.asInstanceOf[ManifestFilePartition]
    val target = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new ManifestGroupRowReader(file, target, conf.value, version, null)
  }
}

/** The shared executor-side parquet row walk (follow source AND batch
  * SQL face): plain Group reads aligned to the declared table schema —
  * add-column → NULL, int-widening, LIST-annotated primitive arrays —
  * with optional `_commit_version` stamping and optional MOR
  * deletion-vector application (`dead` = this file's tombstoned
  * row indexes; Group reads are sequential, so the running row counter
  * IS `_metadata.row_index`).
  */
/** [[org.apache.parquet.hadoop.example.GroupReadSupport]] restricted
  * to the named columns: the requested projection intersects the
  * FILE's own schema by name in `init`, so column pruning works on
  * every file regardless of its schema-evolution vintage and parquet
  * skips the unrequested column chunks entirely.
  */
private[sources] class ProjectingGroupReadSupport(names: Set[String])
    extends org.apache.parquet.hadoop.example.GroupReadSupport {
  override def init(context: org.apache.parquet.hadoop.api.InitContext)
      : org.apache.parquet.hadoop.api.ReadSupport.ReadContext = {
    import scala.jdk.CollectionConverters._
    val full = context.getFileSchema
    val kept0 = full.getFields.asScala.filter(f => names.contains(f.getName))
    // a count(*)-style scan prunes to NO stored columns — keep the
    // first file column so the row cadence (and DV positions) survive
    val kept = if (kept0.nonEmpty) kept0 else full.getFields.asScala.take(1)
    new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(
      new org.apache.parquet.schema.MessageType(full.getName, kept.asJava))
  }
}

private[sources] class ManifestGroupRowReader(
    file: String, target: StructType,
    hadoopConf: org.apache.hadoop.conf.Configuration,
    version: Int, dead: java.util.Set[java.lang.Long])
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  private val reader = org.apache.parquet.hadoop.ParquetReader
    .builder(new ProjectingGroupReadSupport(target.fieldNames.toSet),
      new org.apache.hadoop.fs.Path(file))
    .withConf(hadoopConf)
    .build()
  private var current: Group = _
  private var rowIdx = -1L

  override def next(): Boolean = {
    current = reader.read()
    rowIdx += 1
    while (current != null && dead != null && dead.contains(rowIdx)) {
      current = reader.read()
      rowIdx += 1
    }
    current != null
  }

      /** One LIST-annotated array column (Spark's 3-level layout:
        * `optional group f (LIST) { repeated group list { element } }`)
        * into a Catalyst ArrayData of the target element type — the
        * shape every `array<float>` embedding column on disk has.
        */
      private def convertArray(g: Group, idx: Int, et: DataType,
                               name: String): Any = {
        val outer = g.getGroup(idx, 0) // the single repeated-list group
        val n = outer.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var i = 0
        while (i < n) {
          val entry = outer.getGroup(0, i)
          out(i) =
            if (entry.getFieldRepetitionCount(0) == 0) null
            else et match {
              case FloatType   => entry.getFloat(0, 0)
              case DoubleType  => entry.getDouble(0, 0)
              case IntegerType => entry.getInteger(0, 0)
              case LongType    => entry.getLong(0, 0)
              case StringType  => UTF8String.fromBytes(entry.getBinary(0, 0).getBytes)
              case other => throw new IllegalStateException(
                s"manifest-follow: array<${other.simpleString}> column '$name' " +
                  "unsupported — use ManifestLog.follow")
            }
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      }

      private def convert(g: Group, f: StructField): Any = {
        if (f.name == ManifestFollowSource.VersionCol) return version
        val gt = g.getType
        if (!gt.containsField(f.name)) return null // column added after this file
        val idx = gt.getFieldIndex(f.name)
        if (g.getFieldRepetitionCount(idx) == 0) return null
        val pt = gt.getType(idx)
        if (!pt.isPrimitive) {
          val isList = pt.getLogicalTypeAnnotation ==
            org.apache.parquet.schema.LogicalTypeAnnotation.listType()
          (f.dataType, isList) match {
            case (ArrayType(et, _), true) => return convertArray(g, idx, et, f.name)
            case _ => throw new IllegalStateException(
              s"manifest-follow: nested column '${f.name}' unsupported — use ManifestLog.follow")
          }
        }
        val prim = pt.asPrimitiveType().getPrimitiveTypeName
        (f.dataType, prim) match {
          case (LongType, INT64)   => g.getLong(idx, 0)
          case (LongType, INT32)   => g.getInteger(idx, 0).toLong // widened table
          case (IntegerType, INT32) => g.getInteger(idx, 0)
          case (DoubleType, DOUBLE) => g.getDouble(idx, 0)
          case (DoubleType, FLOAT)  => g.getFloat(idx, 0).toDouble
          case (DoubleType, INT32)  => g.getInteger(idx, 0).toDouble
          case (DoubleType, INT64)  => g.getLong(idx, 0).toDouble
          case (FloatType, FLOAT)   => g.getFloat(idx, 0)
          case (BooleanType, BOOLEAN) => g.getBoolean(idx, 0)
          case (StringType, BINARY) => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
          case (BinaryType, BINARY) => g.getBinary(idx, 0).getBytes
          case (DateType, INT32)    => g.getInteger(idx, 0)
          case (TimestampType | TimestampNTZType, INT64) =>
            pt.getLogicalTypeAnnotation match {
              case ts: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                ts.getUnit match {
                  case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS =>
                    g.getLong(idx, 0)
                  case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MILLIS =>
                    g.getLong(idx, 0) * 1000L
                  case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS =>
                    Math.floorDiv(g.getLong(idx, 0), 1000L)
                }
              case other => throw new IllegalStateException(
                s"manifest-follow: timestamp column '${f.name}' with annotation $other unsupported")
            }
          case (d: DecimalType, INT32 | INT64 | BINARY | FIXED_LEN_BYTE_ARRAY) =>
            // decimals arrive as their unscaled integer in the FILE's
            // own (precision, scale) annotation; realign to the table
            // scale (the widening lattice, same as int promotion)
            pt.getLogicalTypeAnnotation match {
              case dec: org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
                val unscaled = prim match {
                  case INT32 => java.math.BigInteger.valueOf(g.getInteger(idx, 0).toLong)
                  case INT64 => java.math.BigInteger.valueOf(g.getLong(idx, 0))
                  case _     => new java.math.BigInteger(g.getBinary(idx, 0).getBytes)
                }
                val out = org.apache.spark.sql.types.Decimal(
                  new java.math.BigDecimal(unscaled, dec.getScale))
                if (!out.changePrecision(d.precision, d.scale))
                  throw new IllegalStateException(
                    s"manifest-follow: decimal '${f.name}' value overflows ${d.simpleString}")
                out
              case other => throw new IllegalStateException(
                s"manifest-follow: decimal column '${f.name}' with annotation $other unsupported")
            }
          case (dt, p) => throw new IllegalStateException(
            s"manifest-follow: column '${f.name}' $p -> ${dt.simpleString} unsupported — " +
              "use ManifestLog.follow")
        }
      }

      override def get(): InternalRow =
        new GenericInternalRow(target.fields.map(f => convert(current, f)))

      override def close(): Unit = reader.close()
}
