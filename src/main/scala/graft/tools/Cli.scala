package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Predicates
import graft.ktk.{DatasetMetadata, Ktk}

/** Minimal CLI (≙ kartothek/cli: info / query / index / delete / cleanup /
  * copy).
  *
  * {{{
  *   runMain graft.tools.Cli info    <base> <uuid>
  *   runMain graft.tools.Cli query   <base> <uuid> "<col op value & ...>" [limit]
  *   runMain graft.tools.Cli index   <base> <uuid> <column>
  *   runMain graft.tools.Cli bloom   <base> <uuid> <column>
  *   runMain graft.tools.Cli zonemap <base> <uuid> <column> [column ...]
  *   runMain graft.tools.Cli cleanup <base> <uuid>
  *   runMain graft.tools.Cli compact <base> <uuid>
  *   runMain graft.tools.Cli delete  <base> <uuid>
  *   runMain graft.tools.Cli list    <base>
  *   runMain graft.tools.Cli copy    <base> <uuid> <toUuid>
  * }}}
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Cli <info|query|index|cleanup|delete|list> ...")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-cli").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Unit = args(0) match {
    case "list" =>
      DatasetMetadata.listDatasets(spark, args(1)).foreach(println)
    case "info" =>
      val md = DatasetMetadata.load(spark, args(1), args(2))
      println(s"uuid: ${md.uuid}")
      println(s"partition keys: ${md.partitionKeys.mkString(", ")}")
      println(s"partitions: ${md.partitions.size}")
      println(s"indices: ${md.indices.keys.toSeq.sorted.mkString(", ")}")
      println(s"schema:\n${md.schema.treeString}")
    case "query" =>
      val preds = if (args.length > 3 && args(3).nonEmpty) Predicates.parse(args(3)) else Predicates.empty
      val limit = if (args.length > 4) args(4).toInt else 20
      Ktk.readTable(spark, args(1), args(2), predicates = preds).show(limit, truncate = false)
    case "index" =>
      Ktk.addIndex(spark, args(1), args(2), args(3))
      println(s"indexed ${args(3)}")
    case "bloom" =>
      Ktk.addBloom(spark, args(1), args(2), args(3))
      println(s"bloom sidecar built for ${args(3)}")
    case "zonemap" =>
      Ktk.addZoneMaps(spark, args(1), args(2), args.drop(3).toSeq)
      println(s"zone maps computed for ${args.drop(3).mkString(", ")}")
    case "stats" =>
      Ktk.parquetStats(spark, args(1), args(2)).show(100, truncate = false)
    case "cleanup" =>
      Ktk.garbageCollect(spark, args(1), args(2)).foreach(k => println(s"deleted $k"))
    case "compact" =>
      val md = Ktk.compact(spark, args(1), args(2))
      println(s"compacted to ${md.partitions.size} files (run cleanup to drop the old ones)")
    case "delete" =>
      DatasetMetadata.delete(spark, args(1), args(2))
      println(s"deleted dataset ${args(2)}")
    case "copy" =>
      // ≙ `kartothek copy` (kartothek/cli/_copy.py): clone files + metadata
      Ktk.copyDataset(spark, args(1), args(2), args(3))
      println(s"copied dataset ${args(2)} -> ${args(3)}")
    case other => throw new IllegalArgumentException(s"unknown command: $other")
  }
}
