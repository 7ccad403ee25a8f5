package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.ManifestLog

/** SQL catalog for manifest tables — the DDL face a non-Scala consumer
  * uses instead of path options (the Delta-catalog shape):
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
  *
  * CREATE TABLE graft.docs (doc_id BIGINT, body STRING)
  *   USING manifest TBLPROPERTIES ('statsCol' = 'doc_id')
  * INSERT INTO graft.docs SELECT ...
  * SELECT * FROM graft.docs VERSION AS OF 3       -- time travel
  * SELECT * FROM graft.docs TIMESTAMP AS OF '...'
  * INSERT OVERWRITE graft.docs SELECT ...          -- versioned replace
  * DROP TABLE graft.docs
  * }}}
  *
  * Every table is a [[graft.operators.ManifestLog]] directory:
  * managed tables live under `<warehouse>/<ns...>/<name>`, external
  * tables wherever `LOCATION` points (DROP then only unregisters —
  * the Hive external-table discipline — while managed data is
  * deleted). The catalog itself holds NO state beyond the filesystem:
  * a table exists iff its directory carries manifest versions or a
  * DDL-declared schema ([[ManifestLog.initTable]]), so two sessions
  * pointed at the same warehouse see the same catalog with no
  * metastore service — all coordination rides on the manifest log's
  * own pointer CAS. Scale shape: `loadTable` reads metadata only
  * (version pointer + schema); scans/writes plan through
  * [[ManifestBatchTable]], one partition per live file with DV
  * footer-skipping, zone-map file pruning and the V1Write commit
  * bridge — identical to the options face.
  *
  * Reference (shape only): Delta's `DeltaCatalog`; time-travel syntax
  * lands through Spark's `TableCatalog.loadTable(ident, version)` /
  * `(ident, timestampMicros)` overloads.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      sys.props("java.io.tmpdir") + s"/graft-warehouse-$name")
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active

  private def fs(p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def managedPath(ident: Identifier): String =
    (warehouse +: ident.namespace() :+ ident.name()).mkString("/")

  /** The table's directory: the registered external LOCATION if one
    * was declared at CREATE, else the managed warehouse path.
    */
  private def tablePath(ident: Identifier): String = {
    val managed = managedPath(ident)
    externalLocation(ident).getOrElse(managed)
  }

  // external-table registrations: one marker file per table under the
  // warehouse (the only catalog-private state; everything else is the
  // manifest dir itself)
  private def extMarker(ident: Identifier): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(managedPath(ident) + ".location")

  private def externalLocation(ident: Identifier): Option[String] = {
    val m = extMarker(ident)
    val f = fs(warehouse)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    externalLocation(ident).isDefined ||
      ManifestLog.tableExists(spark, managedPath(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (warehouse +: namespace).mkString("/")
    val f = fs(warehouse)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(p)) return Array.empty
    f.listStatus(p).iterator.flatMap { s =>
      val n = s.getPath.getName
      if (s.isDirectory && ManifestLog.tableExists(spark, s"$dir/$n"))
        Some(Identifier.of(namespace, n))
      else if (s.isFile && n.endsWith(".location"))
        Some(Identifier.of(namespace, n.stripSuffix(".location")))
      else None
    }.toArray
  }

  private def tableAt(ident: Identifier, version: Int,
                      pinned: Boolean = false): Table = {
    val path = tablePath(ident)
    val schema =
      if (version >= 1) ManifestLog.read(spark, path, version).schema
      else ManifestLog.ddlSchema(spark, path).getOrElse(new StructType())
    new ManifestBatchTable(path, version, schema,
      ManifestLog.statsColumn(spark, path), None, pinnedVersion = pinned)
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    tableAt(ident, ManifestLog.currentVersion(spark, tablePath(ident)))
  }

  /** `SELECT ... FROM graft.t VERSION AS OF n`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    tableAt(ident, version.toInt, pinned = true)
  }

  /** `TIMESTAMP AS OF` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    tableAt(ident,
      ManifestLog.versionAsOf(spark, tablePath(ident), timestampMicros / 1000L),
      pinned = true)
  }

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = info.properties()
    val external = Option(props.get(TableCatalog.PROP_LOCATION))
      .filter(_ => !"true".equalsIgnoreCase(
        props.getOrDefault(TableCatalog.PROP_IS_MANAGED_LOCATION, "false")))
    external.foreach { loc =>
      val f = fs(warehouse)
      f.mkdirs(new org.apache.hadoop.fs.Path(managedPath(ident)).getParent)
      val out = f.create(extMarker(ident), true)
      try out.write(loc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val path = tablePath(ident)
    val schema = info.schema()
    // an external CREATE over an EXISTING manifest dir just registers
    // it (schema comes from the data); a fresh table declares its
    // schema + stats key before any data lands
    if (ManifestLog.currentVersion(spark, path) == 0) {
      require(schema.nonEmpty,
        s"CREATE TABLE ${ident.name()} needs columns (or point LOCATION at an existing manifest table)")
      // 'statsCols' = 'a,b,c' declares a Hilbert-clustered table (2-4
      // axes, each with its own zone-map dimension); 'statsCol' the
      // plain single-key form
      val statsCols = Option(props.get("statsCols"))
        .orElse(Option(props.get(TableCatalog.OPTION_PREFIX + "statsCols")))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq(Option(props.get("statsCol"))
          .orElse(Option(props.get(TableCatalog.OPTION_PREFIX + "statsCol")))
          .getOrElse(schema.fieldNames.head)))
      ManifestLog.initTable(spark, path, schema, statsCols)
    }
    tableAt(ident, ManifestLog.currentVersion(spark, path))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE on manifest tables: schema evolves through writes " +
        "(widening lattice); constraints via ManifestLog.addConstraint")

  /** Managed data is deleted; an external registration is only
    * unregistered (the Hive discipline).
    */
  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val f = fs(warehouse)
    externalLocation(ident) match {
      case Some(_) => f.delete(extMarker(ident), false)
      case None =>
        f.delete(new org.apache.hadoop.fs.Path(managedPath(ident)), true)
    }
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val f = fs(warehouse)
    f.mkdirs(new org.apache.hadoop.fs.Path(managedPath(newIdent)).getParent)
    externalLocation(oldIdent) match {
      case Some(_) =>
        f.rename(extMarker(oldIdent), extMarker(newIdent))
      case None =>
        f.rename(new org.apache.hadoop.fs.Path(managedPath(oldIdent)),
          new org.apache.hadoop.fs.Path(managedPath(newIdent)))
    }
  }

  // ---- namespaces: directories under the warehouse ----

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] = {
    val f = fs(warehouse)
    val p = new org.apache.hadoop.fs.Path(warehouse)
    if (!f.exists(p)) return Array.empty
    f.listStatus(p).iterator
      .filter(s => s.isDirectory &&
        !ManifestLog.tableExists(spark, s"$warehouse/${s.getPath.getName}"))
      .map(s => Array(s.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(catalogName +: namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      fs(warehouse).exists(
        new org.apache.hadoop.fs.Path((warehouse +: namespace).mkString("/")))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    fs(warehouse).mkdirs(
      new org.apache.hadoop.fs.Path((warehouse +: namespace).mkString("/")))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace metadata is not stored")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    if (!cascade && listTables(namespace).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        catalogName +: namespace)
    fs(warehouse).delete(
      new org.apache.hadoop.fs.Path((warehouse +: namespace).mkString("/")), true)
  }
}
