package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ktk._
import graft.core._

/** Manual end-to-end drive of the public Ktk API against real testdata.
  * Run: sbt "Test/runMain graft.tools.DriveVerify"
  */
object DriveVerify {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val base = java.nio.file.Files.createTempDirectory("verify").toString
    println("== store lineitem partitioned by l_returnflag, index on l_linestatus")
    val md = Ktk.store(spark, base, "lineitem", li, partitionOn = Seq("l_returnflag"),
      secondaryIndices = Seq("l_linestatus"), sortBy = Seq("l_shipdate"))
    println(s"partitions=${md.partitions.size} indices=${md.indices}")
    val back = Ktk.readTable(spark, base, "lineitem")
    println(s"roundtrip rows: ${back.count()} vs source ${li.count()}")
    val preds = Predicates.of(Seq(("l_returnflag", "==", "R"), ("l_quantity", ">", 30.0)))
    val sel = Ktk.readTable(spark, base, "lineitem", columns = Seq("l_orderkey", "l_quantity"), predicates = preds)
    val expected = li.filter(col("l_returnflag") === "R" && col("l_quantity") > 30.0).count()
    println(s"pushdown rows: ${sel.count()} expected $expected onlyR=${sel.inputFiles.forall(_.contains("l_returnflag=R"))}")
    println("== index pruning on l_linestatus=O (non-partition col)")
    val viaIdx = Ktk.readTable(spark, base, "lineitem", predicates = Predicates.of(Seq(("l_linestatus", "==", "O"))))
    println(s"idx rows: ${viaIdx.count()} expected ${li.filter(col("l_linestatus") === "O").count()}")
    println("== update: delete R partition, append filtered R rows > 40 qty")
    Ktk.update(spark, base, "lineitem", Some(li.filter(col("l_returnflag") === "R" && col("l_quantity") > 40.0)),
      deleteScope = Predicates.of(Seq(("l_returnflag", "==", "R"))))
    val after = Ktk.readTable(spark, base, "lineitem")
    val exp2 = li.filter(col("l_returnflag") =!= "R").count() +
      li.filter(col("l_returnflag") === "R" && col("l_quantity") > 40.0).count()
    println(s"after update rows: ${after.count()} expected $exp2")
    println(s"gc deleted: ${Ktk.garbageCollect(spark, base, "lineitem").size} files")
    println(s"after gc rows: ${Ktk.readTable(spark, base, "lineitem").count()} expected $exp2")
    println("== probe: missing dataset")
    try Ktk.readTable(spark, base, "nope")
    catch { case e: Exception => println(s"error ok: ${e.getMessage}") }
    println("== probe: store existing without overwrite")
    try Ktk.store(spark, base, "lineitem", li)
    catch { case e: Exception => println(s"error ok: ${e.getMessage}") }
    println("== probe: empty result predicate")
    println("empty: " + Ktk.readTable(spark, base, "lineitem",
      predicates = Predicates.of(Seq(("l_returnflag", "==", "ZZZ")))).count())
    println("== pushdown plan")
    sel.explain("formatted")

    // ---- cube on real tables: orders seed enriched with customer
    import graft.cube.{Cube, CubeDef}
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val cubeBase = java.nio.file.Files.createTempDirectory("verify-cube").toString
    val cube = CubeDef("tpch", dimensionColumns = Seq("o_custkey", "o_orderkey"),
      partitionColumns = Seq("bucket"))
    val seedDf = orders.withColumn("bucket", pmod(col("o_custkey"), lit(4)))
    val enrichDf = customer.withColumnRenamed("c_custkey", "o_custkey")
      .withColumn("bucket", pmod(col("o_custkey"), lit(4)))
    Cube.build(spark, cubeBase, cube, Map("seed" -> seedDf, "cust" -> enrichDf))
    val cq = Cube.query(spark, cubeBase, cube,
      conditions = Predicates.of(Seq(("c_mktsegment", "==", "BUILDING"), ("o_totalprice", ">", 100000.0))))
    val cqExpected = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING" && col("o_totalprice") > 100000.0).count()
    println(s"cube query rows: ${cq.count()} expected $cqExpected")

    // ---- pipeline ops on real documents/embeddings
    import graft.ops._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stats = TextAnalysis.documentStats(docs, "doc_id", "text")
    val langAcc = stats.join(docs, "doc_id")
      .filter(col("lang_guess") === col("lang")).count().toDouble / docs.count()
    println(f"langid accuracy on synthetic docs: $langAcc%.2f (word-salad text; en-biased is expected)")
    val nearDups = Dedup.minhashCandidates(docs, "doc_id", "text").filter(col("est_jaccard") >= 0.7).count()
    println(s"minhash near-dup pairs at 0.7: $nearDups")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.limit(3).select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val topk = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", "query_id", "qvec", 5)
    println(s"ann topk rows: ${topk.count()} (expect 15)")
    spark.stop()
  }
}
