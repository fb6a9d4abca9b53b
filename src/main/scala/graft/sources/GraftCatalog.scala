package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
class GraftCatalog extends TableCatalog with ProcedureCatalog {

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

  /** SQL time travel: `SELECT ... FROM <cat>.default.t VERSION AS OF n`.
    * Same snapshot rule as `Ktk.readTableAsOf` / the DSv2 `asOfVersion`
    * option: canonical sidecar registries are dropped (they hold
    * post-snapshot content); inline zone maps travel in the blob.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val uuid = uuidOf(ident)
    if (!DatasetMetadata.exists(spark, base, uuid))
      throw new NoSuchTableException(ident)
    val snap = DatasetMetadata.loadVersion(spark, base, uuid, version.toLong)
    new GraftTable(base, snap.copy(indices = Map.empty, blooms = Map.empty,
      zones = Map.empty, zoneMaps = Map.empty))
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "TIMESTAMP AS OF is not supported (commits are not timestamped); " +
        "use VERSION AS OF <commit version>")

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

  // ----------------------------------------------------- SQL procedures
  //
  // Iceberg-style maintenance verbs as Spark 4 stored procedures:
  //   CALL gk.system.compact(table => 't')
  //   CALL gk.system.materialize_deletes(table => 't')
  //   CALL gk.system.gc(table => 't', retain_versions => 3, dry_run => true)
  //   CALL gk.system.optimize(table => 't')
  //   CALL gk.system.rollback(table => 't', version => 4)
  //   CALL gk.system.zorder(table => 't', columns => 'a,b')
  // Each runs the same engine entry point the CLI/API use and returns a
  // small result row (O(metadata) except the rewrites they orchestrate).

  import GraftCatalog.{proc, stringParam}

  private def versionRow(md: DatasetMetadata): Seq[InternalRow] =
    Seq(InternalRow(md.version, md.partitions.size.toLong))
  private val versionSchema = StructType(Seq(
    StructField("version", LongType), StructField("files", LongType)))

  private lazy val procedures: Map[String, UnboundProcedure] = Map(
    "compact" -> proc("compact", Array(stringParam("table")), versionSchema) { in =>
      versionRow(Ktk.compact(spark, base, in.getUTF8String(0).toString))
    },
    "materialize_deletes" -> proc("materialize_deletes",
      Array(stringParam("table")), versionSchema) { in =>
      versionRow(Ktk.materializeDeletes(spark, base, in.getUTF8String(0).toString))
    },
    "optimize" -> proc("optimize", Array(stringParam("table")), versionSchema) { in =>
      versionRow(Ktk.optimize(spark, base, in.getUTF8String(0).toString))
    },
    "rollback" -> proc("rollback",
      Array(stringParam("table"),
        ProcedureParameter.in("version", LongType).build()), versionSchema) { in =>
      versionRow(Ktk.rollback(spark, base, in.getUTF8String(0).toString, in.getLong(1)))
    },
    "zorder" -> proc("zorder",
      Array(stringParam("table"), stringParam("columns")), versionSchema) { in =>
      versionRow(Ktk.clusterZOrder(spark, base, in.getUTF8String(0).toString,
        in.getUTF8String(1).toString.split(',').toSeq.map(_.trim).filter(_.nonEmpty)))
    },
    "history" -> proc("history", Array(stringParam("table")),
      StructType(Seq(
        StructField("version", LongType), StructField("committed_at", TimestampType),
        StructField("files", LongType), StructField("bytes", LongType),
        StructField("tombstone_fragments", LongType),
        StructField("is_rollback", BooleanType), StructField("rollback_of", LongType)))) { in =>
      Ktk.history(spark, base, in.getUTF8String(0).toString)
        .queryExecution.executedPlan.executeCollect().toSeq
    },
    "gc" -> proc("gc",
      Array(stringParam("table"),
        ProcedureParameter.in("retain_versions", IntegerType).defaultValue("0").build(),
        ProcedureParameter.in("dry_run", BooleanType).defaultValue("false").build()),
      StructType(Seq(StructField("path", StringType)))) { in =>
      Ktk.garbageCollect(spark, base, in.getUTF8String(0).toString,
        retainVersions = in.getInt(1), dryRun = in.getBoolean(2))
        .map(p => InternalRow(UTF8String.fromString(p)))
    })

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    procedures.keys.toSeq.sorted
      .map(n => Identifier.of(Array("system"), n)).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.isEmpty || ident.namespace.sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${ident.namespace.mkString(".")}")
    procedures.getOrElse(ident.name,
      throw new IllegalArgumentException(
        s"unknown procedure '${ident.name}'; available: ${procedures.keys.toSeq.sorted.mkString(", ")}"))
  }
}

object GraftCatalog {
  private def stringParam(name: String): ProcedureParameter =
    ProcedureParameter.in(name, StringType).build()

  /** One-class unbound+bound procedure: parameters are static, so bind is
    * identity; `call` runs the side effect and returns ONE LocalScan of
    * result rows.
    */
  private def proc(
      pname: String,
      params: Array[ProcedureParameter],
      outSchema: StructType)(run: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = pname
      override def description(): String = s"graft maintenance procedure $pname"
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val out = run(input).toArray
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = out
          override def readSchema(): StructType = outSchema
        }).iterator()
      }
    }
}
