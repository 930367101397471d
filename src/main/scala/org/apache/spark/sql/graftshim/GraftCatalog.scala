package org.apache.spark.sql.graftshim

import java.util.{Collections, Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only DataSource V2 `TableCatalog` over a directory of parquet lake
  * dirs — the catalog-plugin extension tier, sitting beside the engine's
  * custom-Expression (`fnv64`), custom-SparkPlan (`AsOfJoinExec`) and
  * custom-connector (`mrout`) tiers. It lets a SQL-only consumer address
  * the fixture lake as ordinary three-part names:
  *
  * {{{
  *   SET spark.sql.catalog.lake = org.apache.spark.sql.graftshim.GraftCatalog
  *   SET spark.sql.catalog.lake.root = /data/testlake
  *   SELECT ... FROM lake.sf0_01.lineitem
  * }}}
  *
  * Layout contract: `root/<scale-dir>/<table>.parquet`. A namespace is one
  * scale dir; because `.` separates SQL name parts, a dir name's dots are
  * exposed as underscores (`sf0.01` → namespace `sf0_01`) and decoded back
  * by matching against the actual listing.
  *
  * Tables resolve to Spark's own V2 `ParquetTable`, so scans through the
  * catalog get the standard pushdown/pruning/vectorized-read path — the
  * catalog adds naming, not a bespoke reader (which is why it lives in
  * this shim package: `ParquetTable` is `private[sql]`). Writes and DDL
  * are rejected: the lake is a read-only fixture surface.
  *
  * 100 TB reading: `initialize` stores a path; namespace/table resolution
  * is one driver-side directory listing via the Hadoop FS API (any scheme:
  * HDFS, S3A, local); all data-plane behavior is the stock parquet scan.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    val r = options.get("root")
    require(r != null, s"catalog $name requires option 'root' (the lake directory)")
    catalogName = name
    root = new Path(r)
  }

  override def name(): String = catalogName

  private def fs = {
    val f = root.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    // validate here (every listing funnels through this) so a typo'd root
    // reads as a catalog-level error naming the option, not a raw Hadoop
    // FileNotFoundException out of some later listStatus
    require(f.isDirectory(root),
      s"catalog $catalogName: root '$root' does not exist or is not a directory")
    f
  }

  private def encode(dirName: String): String = dirName.replace('.', '_')

  /** Decode a namespace element back to the real dir by matching the
    * listing (dots in dir names surface as underscores in SQL). The
    * encoding is not injective — sibling dirs `sf0.01` and `sf0_01` both
    * surface as `sf0_01` — so an ambiguous match fails loudly instead of
    * silently picking whichever the filesystem listed first.
    */
  private def resolveDir(ns: Array[String]): Option[Path] = {
    if (ns.length != 1) return None
    val matches = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(p => encode(p.getName) == ns(0))
    if (matches.length > 1)
      throw new IllegalStateException(
        s"catalog $catalogName: namespace '${ns(0)}' is ambiguous — " +
          s"${matches.map(_.getName).sorted.mkString(", ")} all encode to it")
    matches.headOption
  }

  // ------------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(root).filter(_.isDirectory)
      .map(d => Array(encode(d.getPath.getName)))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (resolveDir(namespace).isDefined) Array.empty // single level: no children
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    resolveDir(namespace) match {
      case Some(dir) => Collections.singletonMap("location", dir.toString)
      case None => throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    }

  override def createNamespace(namespace: Array[String], metadata: JMap[String, String]): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("read-only catalog")

  // ---------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = resolveDir(namespace).getOrElse(
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq))
    fs.listStatus(dir)
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .sorted
      .map(f => Identifier.of(namespace, f.stripSuffix(".parquet")))
  }

  override def loadTable(ident: Identifier): Table = {
    val path = resolveDir(ident.namespace())
      .map(dir => new Path(dir, ident.name() + ".parquet"))
      .filter(fs.exists)
      .getOrElse(throw new NoSuchTableException(ident.asInstanceOf[Identifier]))
    ParquetTable(ident.toString, SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(path.toString), None,
      classOf[ParquetFileFormat])
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException("read-only catalog")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("read-only catalog")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")
}
