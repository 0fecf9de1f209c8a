package org.apache.spark.sql.graft

import java.util

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSourceV2 `TableCatalog` over a directory of graft-lake tables —
  * the catalog-service-free analog of the reference's Iceberg/Hive
  * catalog (trino init-tables.sql creates `iceberg.default.weather`;
  * here `spark.sql.catalog.graft=…GraftCatalog` +
  * `spark.sql.catalog.graft.warehouse=<root>` attaches every
  * `<root>/<namespace>/<table>` lake directory as `graft.<ns>.<table>`).
  *
  * What this buys over `spark.read.format("graft-lake").load(path)`:
  * - plain SQL text addressing (`SELECT … FROM graft.ns.t`,
  *   `SHOW TABLES IN graft.ns`), and
  * - SQL time travel: `… FROM graft.ns.t VERSION AS OF 3` routes through
  *   `loadTable(ident, version)` into the snapshot manifest — the
  *   Iceberg SQL surface, backed by the same snapshot log the
  *   DataFrame API reads via `versionAsOf`.
  *
  * The SQL surface is complete enough to live in: DML (`INSERT INTO`,
  * `UPDATE`, `MERGE`, `DELETE FROM`) routes through the committing lake
  * writers via GraftLakeTable, and DDL `CREATE TABLE`/CTAS/`DROP TABLE`
  * lands here (empty-snapshot commit / directory removal). `ALTER TABLE`
  * and `RENAME` stay unsupported by design — schemas evolve on write
  * (the union-schema commit), and rename would break path-addressed
  * readers.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"catalog $name needs spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  /** Without this, `TableOutputResolver` refuses to fill the hidden
    * `ts_hour` column's NULL default and every SQL INSERT/CTAS would have
    * to supply a value for a column the engine derives (see
    * GraftLakeTable.schema()).
    */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def dir(parts: String*): java.io.File =
    new java.io.File((warehouse +: parts).mkString("/"))

  private def tablePath(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def isLakeTable(f: java.io.File): Boolean =
    f.isDirectory && (new java.io.File(f, ManifestFileIndex.ManifestName).exists()
      || new java.io.File(f, "_graft_schema.json").exists()
      || new java.io.File(f, "_SUCCESS").exists())

  // ── tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dir(namespace.toIndexedSeq: _*)
    if (!d.isDirectory) throw new RuntimeException(s"no such namespace: ${namespace.mkString(".")}")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(isLakeTable).map(f => Identifier.of(namespace, f.getName)).sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    isLakeTable(new java.io.File(tablePath(ident)))

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL `VERSION AS OF v` lands here (SPARK-37219 time-travel API). */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version))

  /** SQL `TIMESTAMP AS OF t` (micros since epoch): resolves to the LAST
    * snapshot committed at or before t — commit times are the snapshot
    * manifests' write times, the same convention Iceberg's snapshot log
    * records explicitly.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = tablePath(ident)
    val v = ManifestFileIndex.versionAt(path, timestampMicros / 1000L)
      .getOrElse(throw new RuntimeException(
        s"no snapshot of ${ident.name} committed at or before timestamp $timestampMicros"))
    load(ident, Some(v.toString))
  }

  private def load(ident: Identifier, version: Option[String]): Table = {
    import scala.jdk.CollectionConverters._
    val path = tablePath(ident)
    if (!isLakeTable(new java.io.File(path))) {
      // Iceberg-style metadata tables: `cat.ns.t.files` parses as
      // namespace [ns, t] + name "files" — when the namespace tail IS a
      // lake table and the name is a metadata-table name, serve the
      // manifest-backed LocalScan table (zero data files opened). A real
      // table always shadows: this branch only runs when `path` is not
      // one.
      if (ident.namespace.nonEmpty &&
          GraftMetaTables.Names.contains(ident.name.toLowerCase(java.util.Locale.ROOT))) {
        val parent = (warehouse +: ident.namespace.toSeq).mkString("/")
        if (isLakeTable(new java.io.File(parent)))
          return GraftMetaTables.table(parent,
            ident.name.toLowerCase(java.util.Locale.ROOT), version)
      }
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace.toSeq :+ ident.name).toSeq)
    }
    val opts = Map("path" -> path) ++ version.map("versionAsOf" -> _)
    new GraftLakeSource().getTable(new CaseInsensitiveStringMap(opts.asJava))
  }

  /** SQL `CREATE TABLE` / CTAS: commits an EMPTY snapshot (schema +
    * zero-entry manifest + HEAD), so the new table is immediately a
    * first-class lake — CTAS is this plus Spark's follow-up append write,
    * which routes through the committing lake writer. The engine has ONE
    * layout (hidden hour(ts) partitioning), so only an empty or
    * hours(ts)/identity(ts_hour) PARTITIONED BY clause is accepted, and
    * the schema must carry a `ts` TIMESTAMP.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val path = tablePath(ident)
    if (isLakeTable(new java.io.File(path)))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace.toSeq :+ ident.name).toSeq)
    val okPartitioning = partitions.isEmpty || (partitions.length == 1 && {
      val s = partitions.head.toString
      s == "hours(ts)" || s == "ts_hour" || s == "identity(ts_hour)"
    })
    require(okPartitioning,
      "graft lake tables have one layout — hidden hour(ts) partitioning; " +
        s"PARTITIONED BY ${partitions.mkString(", ")} is not supported")
    graft.sources.LakeIO.createEmpty(path, schema)
    loadTable(ident)
  }

  /** `ALTER TABLE … ADD COLUMN(S)` widens the schema with nullable
    * top-level columns; `ALTER TABLE … DROP COLUMN` logically removes one
    * (no rewrite — readers stop projecting it; the name is tombstoned so
    * it can never be re-added and resurrect old data). Both commit a
    * SCHEMA-ONLY snapshot (same file set, new frozen schema) through the
    * OCC delta commit — earlier snapshots keep their own schema, so the
    * evolution itself is time-travelable. Rename/retype stay unsupported:
    * by-name column mapping cannot express them safely (field IDs could;
    * documented delta).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = tablePath(ident)
    require(isLakeTable(new java.io.File(path)),
      s"not a graft lake table: ${ident.name}")
    val current = graft.sources.LakeIO.tableSchema(path).getOrElse(
      throw new UnsupportedOperationException(
        s"ALTER TABLE: ${ident.name} has no committed schema metadata"))
    val (adds, r1) = changes.partition(_.isInstanceOf[TableChange.AddColumn])
    val (drops, r2) = r1.partition(_.isInstanceOf[TableChange.DeleteColumn])
    val (renames, r3) = r2.partition(_.isInstanceOf[TableChange.RenameColumn])
    val (retypes, unsupported) =
      r3.partition(_.isInstanceOf[TableChange.UpdateColumnType])
    unsupported.headOption.foreach { other =>
      throw new UnsupportedOperationException(
        "graft supports ADD/DROP/RENAME COLUMN and widening ALTER COLUMN " +
          s"TYPE; got $other")
    }
    val added = adds.map { case a: TableChange.AddColumn =>
      require(a.fieldNames.length == 1,
        "ALTER TABLE ADD COLUMN: only top-level columns")
      require(!current.fieldNames.contains(a.fieldNames.head),
        s"column ${a.fieldNames.head} already exists")
      org.apache.spark.sql.types.StructField(
        a.fieldNames.head, a.dataType, nullable = true)
    }
    if (added.nonEmpty) graft.sources.LakeIO.evolveSchema(path, added)
    drops.foreach { case d: TableChange.DeleteColumn =>
      require(d.fieldNames.length == 1,
        "ALTER TABLE DROP COLUMN: only top-level columns")
      graft.sources.LakeIO.dropColumnSchema(path, d.fieldNames.head)
    }
    // RENAME COLUMN / widening ALTER COLUMN TYPE — the field-history
    // column mapping (LakeIO.renameColumn/retypeColumn): metadata-only,
    // old files keep reading
    renames.foreach { case r: TableChange.RenameColumn =>
      require(r.fieldNames.length == 1,
        "ALTER TABLE RENAME COLUMN: only top-level columns")
      graft.sources.LakeIO.renameColumn(path, r.fieldNames.head, r.newName)
    }
    retypes.foreach { case u: TableChange.UpdateColumnType =>
      require(u.fieldNames.length == 1,
        "ALTER TABLE ALTER COLUMN TYPE: only top-level columns")
      graft.sources.LakeIO.retypeColumn(path, u.fieldNames.head, u.newDataType)
    }
    loadTable(ident)
  }

  /** SQL `DROP TABLE`: removes the table directory — data, manifests,
    * snapshots. Destructive by definition; time travel does not survive
    * a DROP (matching Iceberg `DROP TABLE ... PURGE`).
    */
  override def dropTable(ident: Identifier): Boolean = {
    val f = new java.io.File(tablePath(ident))
    if (!isLakeTable(f)) false
    else {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(f); true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft tables are path-addressed (warehouse/<ns>/<table>); RENAME " +
        "would break existing path readers — copy via CTAS instead")

  // ── namespaces (one directory level under the warehouse)

  override def listNamespaces(): Array[Array[String]] =
    Option(new java.io.File(warehouse).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(f => Array(f.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new RuntimeException(s"no such namespace: ${namespace.mkString(".")}")

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || dir(namespace.toIndexedSeq: _*).isDirectory

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new RuntimeException(s"no such namespace: ${namespace.mkString(".")}")

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    dir(namespace.toIndexedSeq: _*).mkdirs(); ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "DROP NAMESPACE is not supported; drop tables individually")
}
