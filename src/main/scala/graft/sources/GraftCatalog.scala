package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ktk.{DatasetMetadata, Ktk}

/** Catalyst [[TableCatalog]] over a graft base directory — the pure-SQL
  * surface (SURVEY §4's optional Catalyst integration, catalog tier):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.gk", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.gk.base", "/data/graft")
  *   spark.sql("SHOW TABLES IN gk.default")
  *   spark.sql("SELECT * FROM gk.default.orders WHERE o_orderkey = 1")
  *   spark.sql("INSERT INTO gk.default.orders SELECT ...")   // atomic commit
  *   spark.sql("DELETE FROM gk.default.orders WHERE ...")    // deletion vectors
  *   spark.sql("CREATE TABLE gk.default.t (k BIGINT, p STRING) PARTITIONED BY (p)")
  *   spark.sql("DROP TABLE gk.default.t")
  * }}}
  *
  * Datasets live FLAT under `base` (the layout every other surface uses),
  * exposed as the single namespace `default`. Reads/writes/deletes all
  * route through the same versioned commit protocol as the programmatic
  * API — a SQL DELETE is a deletion-vector commit, an INSERT is one
  * atomic `update`. Scale shape: catalog calls are O(metadata); nothing
  * here touches data except through the pruned scan paths.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var base: String = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = Option(options.get("base")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires spark.sql.catalog.$name.base = <graft base dir>"))
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array("default")

  private def checkNs(namespace: Array[String]): Unit =
    require(namespace.isEmpty || namespace.sameElements(Array("default")),
      s"graft catalog has the single namespace 'default', got ${namespace.mkString(".")}")

  private def uuidOf(ident: Identifier): String = { checkNs(ident.namespace); ident.name }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    checkNs(namespace)
    DatasetMetadata.listDatasets(spark, base)
      .map(u => Identifier.of(Array("default"), u)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    DatasetMetadata.exists(spark, base, uuidOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val uuid = uuidOf(ident)
    if (!DatasetMetadata.exists(spark, base, uuid))
      throw new NoSuchTableException(ident)
    new GraftTable(base, DatasetMetadata.load(spark, base, uuid))
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    val uuid = uuidOf(ident)
    if (DatasetMetadata.exists(spark, base, uuid))
      throw new TableAlreadyExistsException(ident)
    val partitionOn = partitions.toSeq.map { t =>
      if (t.name == "identity" && t.references.length == 1)
        t.references.head.fieldNames.mkString(".")
      else throw new UnsupportedOperationException(
        s"graft tables support identity partitioning only, got $t")
    }
    // user table properties ride in commit metadata (versioned for free);
    // Spark-reserved props (provider/owner/location) are not ours to keep
    val userProps = properties.asScala.toMap
      .filter { case (k, _) => !k.startsWith("spark.") && k != TableCatalog.PROP_PROVIDER &&
        k != TableCatalog.PROP_OWNER && k != TableCatalog.PROP_LOCATION &&
        k != TableCatalog.PROP_EXTERNAL && k != TableCatalog.PROP_COMMENT }
    val md = Ktk.createEmpty(spark, base, uuid, schema, partitionOn,
      userMetadata = userProps)
    new GraftTable(base, md)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; schema evolves additively through " +
        "update/merge(evolveSchema = true)")

  override def dropTable(ident: Identifier): Boolean = {
    val uuid = uuidOf(ident)
    if (!DatasetMetadata.exists(spark, base, uuid)) false
    else { DatasetMetadata.delete(spark, base, uuid); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = uuidOf(oldIdent); val to = uuidOf(newIdent)
    if (!DatasetMetadata.exists(spark, base, from))
      throw new NoSuchTableException(oldIdent)
    if (DatasetMetadata.exists(spark, base, to))
      throw new TableAlreadyExistsException(newIdent)
    Ktk.copyDataset(spark, base, from, to)
    DatasetMetadata.delete(spark, base, from)
  }
}
