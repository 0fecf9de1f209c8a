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
  * Read-facing by design: writes go through the single-writer LakeIO
  * commit paths (write/evolveAppend/merge/delete), not SQL DDL/DML —
  * `createTable` and friends reject loudly rather than half-support a
  * second, uncommitted write path.
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
    if (!isLakeTable(new java.io.File(path)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace.toSeq :+ ident.name).toSeq)
    val opts = Map("path" -> path) ++ version.map("versionAsOf" -> _)
    new GraftLakeSource().getTable(new CaseInsensitiveStringMap(opts.asJava))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-facing: create tables via LakeIO.writeLake under the warehouse")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-facing: evolve schemas via LakeIO.evolveAppend")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-facing")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-facing")

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
    throw new UnsupportedOperationException("graft catalog is read-facing")
}
