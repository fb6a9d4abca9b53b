package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionizeSpec extends SparkSpec {
  import Sessionize._
  import spark.implicits._

  test("gap-based sessionization closes sessions across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionize(input.toDS(), gapMs = 10000)

    val q = sessions.writeStream
      .format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // batch 1: two events 1s apart (one open session), another user
      input.addData(Event(1, 0, 1.0), Event(1, 1000, 2.0), Event(2, 500, 5.0))
      q.processAllAvailable()
      spark.table("sessions_out").count() shouldBe 0 // nothing closed yet

      // batch 2: user 1 far beyond the gap -> closes the first session
      input.addData(Event(1, 100000, 7.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[Session].collect()
      closed.length shouldBe 1
      closed.head shouldBe Session(1, 0, 1000, 2, 3.0)

      // batch 3: user 2 again within a NEW window far away -> closes user 2's first
      input.addData(Event(2, 200000, 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions_out").as[Session].collect().sortBy(_.userId)
      all.map(_.userId).toSeq shouldBe Seq(1L, 2L)
      all(1) shouldBe Session(2, 500, 500, 1, 5.0)
    } finally q.stop()
  }

  test("late cross-batch event never rewinds the carried session end") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionize(input.toDS(), gapMs = 10000)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out3").outputMode("append").start()
    try {
      input.addData(Event(7, 0, 1.0), Event(7, 1000, 1.0))
      q.processAllAvailable()
      // a LATE event (ts=500 < carried endMs=1000) merges without rewinding
      input.addData(Event(7, 500, 1.0))
      q.processAllAvailable()
      // far event closes the session: end must still be 1000, not 500
      input.addData(Event(7, 100000, 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out3").as[Session].collect()
      closed.toSeq shouldBe Seq(Session(7, 0, 1000, 3, 3.0))
    } finally q.stop()
  }

  test("EventTimeTimeout variant flushes the trailing session of an idle key") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionizeWithTimeout(input.toDS(), gapMs = 10000, watermarkDelay = "1 second")
    val q = sessions.writeStream
      .format("memory").queryName("sessions_to").outputMode("append").start()
    try {
      // user 7: two events, then goes idle forever
      input.addData(Event(7, 1000000, 1.0), Event(7, 1001000, 2.0))
      q.processAllAvailable()
      spark.table("sessions_to").count() shouldBe 0
      // OTHER key's events push the watermark far past 7's gap horizon —
      // 7's trailing session must flush via timeout, no further 7-events
      input.addData(Event(8, 2000000, 5.0))
      q.processAllAvailable()
      input.addData(Event(8, 3000000, 5.0))
      q.processAllAvailable()
      val flushed = spark.table("sessions_to").as[Session].collect().filter(_.userId == 7)
      flushed.toSeq shouldBe Seq(Session(7, 1000000, 1001000, 2, 3.0))
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence per normalized text within watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    // keep event times well above the initial watermark (t=0)
    val ts = (s: Long) => new java.sql.Timestamp((1000000 + s) * 1000)
    val out = StreamDedup.dedupStream(
      input.toDF().toDF("id", "text", "ts"), "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "hello world", ts(0)), (2L, "other doc", ts(1)))
      q.processAllAvailable()
      spark.table("dedup_out").select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L)
      // normalized dup (case + whitespace runs) in a later batch, still
      // within the watermark -> suppressed; fresh content -> emitted
      input.addData((3L, "Hello   WORLD", ts(2)), (4L, "hello world", ts(3)),
        (5L, "fresh doc", ts(4)))
      q.processAllAvailable()
      spark.table("dedup_out").select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L, 5L)
    } finally q.stop()
  }

  test("streaming ingest pipeline: dedup then quality filter then windowed counts") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts = (s: Long) => new java.sql.Timestamp((2000000 + s) * 1000)
    val deduped = StreamDedup.dedupStream(
      input.toDF().toDF("id", "text", "ts"), "text", "ts", "10 minutes")
    // chained stateful ops: dedup state feeds a windowed aggregation
    val out = deduped
      .withColumn("quality", graft.ops.TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_docs"))
    val q = out.writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    try {
      val good = "this is a reasonably long document with enough plain tokens to pass the quality bar"
      input.addData(
        (1L, good + " one", ts(0)),
        (2L, good + "  ONE", ts(1)),   // normalized dup of id=1 -> dropped
        (3L, "!!!", ts(2)))            // fails the quality filter
      q.processAllAvailable()
      // push the watermark past the window so the windowed agg emits
      input.addData((9L, good + " far away", ts(100000)))
      q.processAllAvailable()
      val rows = spark.table("ingest_out").select("n_docs").as[Long].collect()
      rows.toSeq shouldBe Seq(1L) // only id=1 survived dedup + quality
    } finally q.stop()
  }

  test("in-batch gap splits emit closed sessions immediately") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionize(input.toDS(), gapMs = 1000)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out2").outputMode("append").start()
    try {
      input.addData(Event(9, 0, 1.0), Event(9, 100, 1.0), Event(9, 5000, 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out2").as[Session].collect()
      closed.toSeq shouldBe Seq(Session(9, 0, 100, 2, 2.0))
    } finally q.stop()
  }
}
