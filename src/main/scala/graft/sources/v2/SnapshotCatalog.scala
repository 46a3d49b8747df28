package graft.sources.v2

import graft.sources.SnapshotTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL front door for the snapshot table format: a `TableCatalog`
  * plugin registering snapshot roots as NAMED tables, so every surface
  * a SQL user reaches for works without touching the Scala API:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.v2.SnapshotCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
  *
  *   spark.sql("CREATE NAMESPACE graft.db")
  *   spark.sql("""CREATE TABLE graft.db.orders (o_orderkey BIGINT, ...)
  *                USING graft-snapshot
  *                TBLPROPERTIES ('statsCol' = 'o_orderkey')""")
  *   spark.sql("INSERT INTO graft.db.orders SELECT ...")
  *   spark.sql("SELECT * FROM graft.db.orders VERSION AS OF 1")
  *   spark.sql("SELECT * FROM graft.db.orders TIMESTAMP AS OF '...'")
  *   spark.sql("INSERT OVERWRITE graft.db.orders SELECT ...")
  * }}}
  *
  * This plugin exists because the path-based provider
  * ([[SnapshotTableProvider]]) structurally CANNOT serve time travel
  * from SQL: Spark routes `VERSION AS OF`/`TIMESTAMP AS OF` through
  * the catalog's `loadTable(ident, version)`/`loadTable(ident,
  * timestamp)` overloads, which only a catalog receives. Everything
  * downstream of resolution — scan, pruning, write builder — is the
  * SAME code as the provider path ([[SnapshotV2Table]]), so SQL and
  * DataFrame reads of one table can never disagree.
  *
  * Layout is directory-per-name under the configured warehouse:
  * `<warehouse>/<ns...>/<table>` is a snapshot root (its `meta/`
  * subdir is what makes it a table; any other directory is a
  * namespace). The catalog itself holds NO state beyond the warehouse
  * path — the manifests are the metadata, so concurrent sessions (or
  * engines) against the same warehouse see one truth and inherit the
  * format's optimistic-commit semantics.
  *
  * Deliberately loud edges: `CREATE TABLE` requires the `statsCol`
  * table property (the format's one bootstrap declaration) and
  * rejects `PARTITIONED BY` (layout is the stats-column clustering's
  * job — [[SnapshotTable.cluster]]); `ALTER TABLE` is unsupported
  * (schema evolution happens through evolving writes, the format's
  * contract); CTAS works but is non-atomic (create then insert — a
  * `StagingTableCatalog` would close that window; out of scope while
  * single-writer bootstrap is the norm).
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark = SparkSession.active
  private def hconf = spark.sparkContext.hadoopConfiguration

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse=<dir> — " +
        "the root under which snapshot tables live"))
  }

  override def name(): String = catalogName

  private def dirOf(parts: Seq[String]): Path =
    parts.foldLeft(new Path(warehouse))((p, seg) => new Path(p, seg))

  private def tableDir(ident: Identifier): Path =
    dirOf(ident.namespace().toIndexedSeq :+ ident.name())

  /** A directory IS a table iff it has committed snapshot manifests —
    * the same "the manifest is the truth" rule as the format itself.
    */
  private def isTable(dir: Path): Boolean = {
    val fs = dir.getFileSystem(hconf)
    SnapshotTable.latestVersion(fs, dir) > 0
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tableDir(ident))

  private def resolvedTable(ident: Identifier, extra: Map[String, String]): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", dir.toString)
    extra.foreach { case (k, v) => opts.put(k, v) }
    new SnapshotV2Table(SnapshotV2Table.resolve(new CaseInsensitiveStringMap(opts)))
  }

  override def loadTable(ident: Identifier): Table =
    resolvedTable(ident, Map.empty)

  /** `VERSION AS OF v`: the catalog half of time travel. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft snapshot versions are integers, got VERSION AS OF '$version'")
    }
    resolvedTable(ident, Map("versionAsOf" -> v.toString))
  }

  /** `TIMESTAMP AS OF ts`: Spark hands the instant as MICROseconds
    * since epoch; [[SnapshotTable.versionAt]] resolves it against the
    * monotone commit stamps (loud below the retention boundary).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = SnapshotTable.versionAt(spark, dir.toString,
      Math.floorDiv(timestampMicros, 1000L))
    resolvedTable(ident, Map("versionAsOf" -> v.toString))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-snapshot tables do not take PARTITIONED BY — layout is the " +
      "stats column's clustering (SnapshotTable.cluster), not partition dirs")
    import scala.jdk.CollectionConverters._
    val statsCol = properties.asScala.collectFirst {
      case (k, v) if k.equalsIgnoreCase("statscol") => v
    }.getOrElse(throw new IllegalArgumentException(
      "CREATE TABLE on a graft catalog needs TBLPROPERTIES " +
      "('statsCol' = '<integral column>') — the file-envelope column " +
      "every snapshot table declares at bootstrap"))
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    SnapshotTable.createEmpty(spark, dir.toString, schema, statsCol)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported on graft snapshot tables — schema " +
      "widening happens through evolving writes (SnapshotTable" +
      ".appendEvolved / merge), the format's evolution contract")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    val fs = dir.getFileSystem(hconf)
    isTable(dir) && fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported — a snapshot root's path is its " +
      "identity (readers pin manifests by path); copy via CTAS instead")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace.toIndexedSeq)
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).iterator
      .filter(s => s.isDirectory && isTable(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  // ---- namespaces: directories that are not tables ----

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = dirOf(namespace.toIndexedSeq)
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).iterator
      .filter(s => s.isDirectory && !isTable(s.getPath) &&
        !s.getPath.getName.startsWith("."))
      .map(s => namespace :+ s.getPath.getName)
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val dir = dirOf(namespace.toIndexedSeq)
    namespace.isEmpty || {
      val fs = dir.getFileSystem(hconf)
      fs.exists(dir) && !isTable(dir)
    }
  }

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    val dir = dirOf(namespace.toIndexedSeq)
    dir.getFileSystem(hconf).mkdirs(dir): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "ALTER NAMESPACE is not supported — graft namespaces are plain directories")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) false
    else {
      val dir = dirOf(namespace.toIndexedSeq)
      val fs = dir.getFileSystem(hconf)
      if (!cascade && fs.listStatus(dir).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty — " +
          "use DROP NAMESPACE ... CASCADE")
      fs.delete(dir, true)
    }
  }
}
