package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resample: grid cover, gap rows, forward fill, hand-checked") {
    // key 1: events in buckets 0, 0, 3; key 2: bucket 1 only
    val df = Seq(
      (1L, 50L, 2.0), (1L, 80L, 3.0), (1L, 310L, 5.0),
      (2L, 150L, 7.0)
    ).toDF("k", "ts_ms", "value")
    val out = TimeSeries.resample(df, Seq("k"), "ts_ms", "value", stepMs = 100L)
      .orderBy("k", "bucket_ms")
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect().toSeq
    out shouldBe Seq(
      (1L, 0L, 2L, Some(5.0), Some(5.0)),    // 2 events, sum 5
      (1L, 100L, 0L, None, Some(5.0)),       // gap, forward-filled
      (1L, 200L, 0L, None, Some(5.0)),       // gap, forward-filled
      (1L, 300L, 1L, Some(5.0), Some(5.0)),  // real event again
      (2L, 100L, 1L, Some(7.0), Some(7.0)))
  }

  test("resample plan: no cartesian, grid join is an equi-join") {
    val df = (0 until 1000).map(i => (i.toLong % 20, i.toLong * 37, i * 0.5))
      .toDF("k", "ts_ms", "value")
    val plan = TimeSeries.resample(df, Seq("k"), "ts_ms", "value", 500L)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
