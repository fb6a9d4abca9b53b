package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular events to a fixed grid
  * per key, with gap-fill (empty buckets materialized) and forward fill —
  * the standard prep step before feature windows / model joins.
  *
  * Scale shape: the raw stream is touched once (map-side bucket + partial
  * agg, one shuffle on (keys, bucket)); the grid is generated from per-key
  * min/max spans (a key-count-sized frame) via `sequence`+`explode`, so no
  * driver-side loop and no cross join. The gap join and the forward-fill
  * window both run at BUCKET granularity — orders of magnitude smaller
  * than the input at any realistic step.
  */
object TimeSeries {

  /** Resample to `stepMs` buckets per `keys`: returns keys, `bucket_ms`
    * (grid-aligned epoch ms, every step between each key's first and last
    * event), `n` (0 for gaps), `v_sum` (null for gaps, rounded to 2dp),
    * `v_ffill` (forward-filled v_sum).
    */
  def resample(df: DataFrame, keys: Seq[String], tsMsCol: String,
               valueCol: String, stepMs: Long): DataFrame = {
    val keyCols = keys.map(c => col(s"`$c`"))
    val bucket = expr(s"`$tsMsCol` DIV $stepMs")
    val agg = df.groupBy((keyCols :+ bucket.as("__b")): _*)
      .agg(count(lit(1)).as("n"), round(sum(col(s"`$valueCol`")), 2).as("v_sum"))
    val span = agg.groupBy(keyCols: _*)
      .agg(min(col("__b")).as("__mn"), max(col("__b")).as("__mx"))
    val grid = span.select((keyCols :+
      explode(sequence(col("__mn"), col("__mx"))).as("__b")): _*)
    val joined = grid.join(agg, keys :+ "__b", "left")
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("v_ffill", last(col("v_sum"), ignoreNulls = true).over(w))
      .withColumn("bucket_ms", col("__b") * lit(stepMs))
      .drop("__b")
      .select((keyCols :+ col("bucket_ms") :+ col("n") :+ col("v_sum") :+ col("v_ffill")): _*)
  }
}
