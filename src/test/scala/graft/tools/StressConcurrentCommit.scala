package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ktk.{DatasetMetadata, Ktk}

/** Cross-PROCESS concurrent-writer probe: independent JVMs (default 2,
  * `args = <writers> <commitsPerWriter>` scales the fan-in) race
  * `Ktk.update` commits against ONE dataset. VersioningSpec pins the
  * optimistic-retry protocol within one JVM; the reference's real failure
  * mode is separate writers (kartothek's single-blob put is
  * last-wins, `io_components/write.py:232-241` — ours must instead make
  * losing racers RETRY the version claim). Asserts:
  *   - every commit from every writer lands (the in-update blind-append
  *     fast path absorbs most claim collisions metadata-only; the rare
  *     escalation past its bound falls back to withCommitRetries' full
  *     re-run; a writer exhausting both fails its JVM loudly),
  *   - the final snapshot holds exactly initial + writers×N rows with
  *     every writer's key set complete and disjoint,
  *   - version advances by exactly writers×N (none lost, none doubled),
  *   - fsck shows ONLY abandoned-attempt orphans (produced only by the
  *     full-re-run escalations — 0 at 2-way, ~3/40 at 4-way), gc reaps
  *     them to a clean audit, and the secondary index stays readable.
  * Run: sbt "Test/runMain graft.tools.StressConcurrentCommit"
  */
object StressConcurrentCommit {
  def main(args: Array[String]): Unit = args match {
    case Array("child", base, writerId, n) => child(base, writerId.toInt, n.toInt)
    // optional: <writers> <commitsPerWriter> (default 2 x 12)
    case Array(w, n) => parent(w.toInt, n.toInt)
    case _ => parent(2, 12)
  }

  private def session(threads: Int): SparkSession =
    SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()

  /** One writer: N keyed appends, each wrapped in the documented
    * multi-writer retry pattern. Keys are writer-disjoint so the final
    * content check can attribute every row.
    */
  private def child(base: String, writerId: Int, n: Int): Unit = {
    val spark = session(4)
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    (1 to n).foreach { i =>
      val batch = Seq((writerId * 1000000L + i, s"w$writerId-$i")).toDF("k", "v")
      // generous cap: cross-process contention can lose many claims in a
      // row; exhausting it fails the JVM loudly, which the parent reports
      Ktk.withCommitRetries(maxRetries = 60, backoffMs = 20L) {
        Ktk.update(spark, base, "ds", Some(batch))
      }
    }
    spark.stop()
  }

  private def parent(writers: Int, N: Int): Unit = {
    val spark = session(8)
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("concommit").toString
    Ktk.store(spark, base, "ds", Seq((0L, "seed")).toDF("k", "v"))
    Ktk.addIndex(spark, base, "ds", "k") // its own commit: setup ends at v2
    val v0 = DatasetMetadata.load(spark, base, "ds").version

    // two racing JVMs, same classpath/add-opens as this one, small heaps
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString).filter(a =>
        a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    def launch(id: Int): Process = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx3g",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.StressConcurrentCommit", "child", base, id.toString, N.toString)
      new ProcessBuilder(cmd: _*).inheritIO().start()
    }
    val t0 = System.nanoTime()
    val procs = (1 to writers).map(launch)
    val exits = procs.map(_.waitFor())
    val secs = (System.nanoTime() - t0) / 1e9
    require(exits.forall(_ == 0), s"a writer failed loudly: exits=$exits")

    DatasetMetadata.invalidateCache(base, "ds")
    val md = DatasetMetadata.load(spark, base, "ds")
    require(md.version == v0 + writers * N,
      s"expected version ${v0 + writers * N}, got ${md.version} — a commit " +
        "was lost (or double-committed)")
    val rows = Ktk.readTable(spark, base, "ds")
    val got = rows.select("k").as[Long].collect().toSet
    val want = Set(0L) ++
      (1 to writers).flatMap(w => (1 to N).map(i => w * 1000000L + i))
    require(got == want,
      s"content mismatch: missing=${want -- got} extra=${got -- want}")
    // index intact and serving after the race
    val viaIdx = Ktk.readTable(spark, base, "ds",
      predicates = graft.core.Predicates.of(Seq(("k", "==", 1000001L))))
    require(viaIdx.count() == 1L, "index read after race")
    // a loser's abandoned attempt leaves data files no commit references
    // (the conflict is only discoverable at claim time, after the write —
    // same contract as Delta/Iceberg): fsck must report them as ORPHANS
    // and nothing else (no broken chain, no missing file, no dangling
    // sidecar), and gc must reap them back to a clean audit
    val faults = Ktk.fsck(spark, base, "ds").collect()
    val kinds = faults.map(_.getString(0)).toSet
    require(kinds.subsetOf(Set("orphan_file", "orphan_overflow")),
      s"non-orphan faults after the race:\n${faults.mkString("\n")}")
    Ktk.garbageCollect(spark, base, "ds", retainVersions = Int.MaxValue,
      sidecarGraceMs = 0)
    val after = Ktk.fsck(spark, base, "ds").count()
    require(after == 0L, s"fsck still dirty after gc: $after faults")
    require(Ktk.readTable(spark, base, "ds").count() == want.size.toLong,
      "gc must only reap the abandoned attempts, never live rows")
    println(f"concurrent-commit race: $writers writers x $N commits in $secs%.1f s, " +
      s"version=${md.version}, rows=${got.size}, " +
      s"abandoned-attempt orphans=${faults.count(_.getString(0) == "orphan_file")} " +
      "(reaped by gc; fsck clean after)")
    spark.stop()
  }
}
