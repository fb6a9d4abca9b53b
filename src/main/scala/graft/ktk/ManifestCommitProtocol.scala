package graft.ktk

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.sql.SparkSession

/** Direct-write commit protocol that reports committed (label, size) pairs
  * back to the driver through the task commit messages, so dataset commits
  * never have to re-list the table directory to discover what a write job
  * produced. On an object store with millions of historical files the
  * recursive listing dominates every incremental commit; the write job
  * itself already knows its files.
  *
  * Files are written straight to their final location under globally unique
  * names (no `_temporary` rename dance — object-store friendly). That is
  * safe here because graft's ONLY commit point is the metadata blob: files
  * from failed or aborted jobs are simply never referenced, invisible to
  * readers, and reaped by [[Ktk.garbageCollect]]. Only the files of the ONE
  * winning task attempt (the output commit coordinator picks it) reach the
  * job-level manifest.
  *
  * This is the same decoupled "physical files + logical manifest commit"
  * shape Delta Lake's DelayedCommitProtocol uses (public pattern), adapted
  * to graft's single-blob catalog.
  */
class ManifestCommitProtocol(jobId: String, path: String, dynamicPartitionOverwrite: Boolean)
    extends FileCommitProtocol with Serializable {
  require(!dynamicPartitionOverwrite,
    "ManifestCommitProtocol supports append-style writes only")

  // task-side: labels (paths relative to `path`) this task attempt wrote
  @transient private var added: scala.collection.mutable.ArrayBuffer[String] = _

  override def setupJob(jobContext: JobContext): Unit = ()

  override def commitJob(jobContext: JobContext, taskCommits: Seq[TaskCommitMessage]): Unit = {
    // commitJob may run on an AQE worker thread (adaptive plans execute the
    // write stage off the action thread), so correlation is by the token the
    // caller planted in the job's Hadoop conf, never by thread identity
    val token = jobContext.getConfiguration.get(ManifestCommitProtocol.TokenKey)
    if (token != null)
      ManifestCommitProtocol.publish(token,
        taskCommits.flatMap(_.obj.asInstanceOf[Seq[(String, Long)]]))
  }

  override def abortJob(jobContext: JobContext): Unit = ()

  override def setupTask(taskContext: TaskAttemptContext): Unit =
    added = scala.collection.mutable.ArrayBuffer.empty[String]

  override def newTaskTempFile(
      taskContext: TaskAttemptContext, dir: Option[String], spec: FileNameSpec): String = {
    val split = taskContext.getTaskAttemptID.getTaskID.getId
    // a fresh UUID per file keeps concurrent jobs and speculative/retried
    // attempts from ever colliding on a final path
    val name =
      f"${spec.prefix}part-$split%05d-${java.util.UUID.randomUUID()}${spec.suffix}"
    val rel = dir.map(d => s"$d/$name").getOrElse(name)
    added += rel
    new Path(path, rel).toString
  }

  override def newTaskTempFileAbsPath(
      taskContext: TaskAttemptContext, absoluteDir: String, spec: FileNameSpec): String =
    throw new UnsupportedOperationException(
      "ManifestCommitProtocol does not support absolute-path files")

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage = {
    // sizes resolve task-side — O(files-of-this-task) lookups, distributed
    val conf = taskContext.getConfiguration
    val withSizes: Seq[(String, Long)] = added.toSeq.map { rel =>
      val p = new Path(path, rel)
      rel -> p.getFileSystem(conf).getFileStatus(p).getLen
    }
    new TaskCommitMessage(withSizes)
  }

  override def abortTask(taskContext: TaskAttemptContext): Unit =
    if (added != null) {
      val conf = taskContext.getConfiguration
      added.foreach { rel =>
        val p = new Path(path, rel)
        try { p.getFileSystem(conf).delete(p, false); () }
        catch { case _: java.io.IOException => () } // best effort; gc reaps
      }
    }
}

object ManifestCommitProtocol {
  /** Conf key carrying the caller's correlation token: session confs are
    * copied verbatim into each write job's Hadoop conf (newHadoopConf), so
    * the same key set via spark.conf.set is readable in commitJob.
    */
  val TokenKey = "graft.manifest.token"

  // token → committed files. The manifest is catalog-sized (labels + sizes,
  // O(batch files)); entries are removed by the caller's finally block.
  private val results =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long)]]()

  private[ktk] def publish(token: String, files: Seq[(String, Long)]): Unit = {
    results.put(token, files); ()
  }

  // Serializes in-JVM manifest-collecting writes: the token and protocol
  // ride SESSION-level confs, which concurrent writer threads sharing one
  // SparkSession would clobber for each other. (The pre-manifest listing
  // diff was worse — it silently CLAIMED a concurrent writer's files.)
  // Multi-driver concurrency — the two-phase committer pattern — is
  // unaffected: separate JVMs, separate sessions.
  private val writeLock = new java.util.concurrent.locks.ReentrantLock(true)

  /** Run `write` — exactly one df.write action — with this protocol active;
    * returns the (relative label, byte size) pairs the job committed. The
    * previous protocol conf is restored afterwards. Correlation is by a
    * fresh token in the job conf, so commitJob may run on any thread (AQE
    * executes write stages off the action thread); in-JVM concurrent
    * callers serialize on a fair lock.
    */
  def collecting(spark: SparkSession)(write: => Unit): Seq[(String, Long)] = {
    val protoKey = "spark.sql.sources.commitProtocolClass"
    val token = java.util.UUID.randomUUID().toString
    val tokenConf = TokenKey
    writeLock.lock()
    try {
      val prev = spark.conf.getOption(protoKey)
      spark.conf.set(protoKey, classOf[ManifestCommitProtocol].getName)
      spark.conf.set(tokenConf, token)
      try {
        write
        Option(results.get(token)).getOrElse(throw new IllegalStateException(
          "write action did not report a commit manifest"))
      } finally {
        results.remove(token)
        spark.conf.unset(tokenConf)
        prev match {
          case Some(v) => spark.conf.set(protoKey, v)
          case None    => spark.conf.unset(protoKey)
        }
      }
    } finally writeLock.unlock()
  }
}
