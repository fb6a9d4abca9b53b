package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, composed from built-ins
  * (preference (a) of the custom-operator ladder — no custom strategy
  * needed: the union+carry-forward plan is one shuffle on the join keys).
  */
object Joins {

  /** As-of (backward) join: every left row picks the LATEST right row with
    * `right.ts <= left.ts` for the same keys — the standard event-to-state
    * join (trades→quotes, events→latest-dimension-version).
    *
    * Plan shape: tag both sides, union, one window partitioned by keys
    * ordered by (ts, side) with right rows sorting before left rows at equal
    * timestamps (inclusive semantics), carry the right payload forward with
    * `last(ignoreNulls)`, keep left rows. ONE shuffle on the keys, sorted
    * within partitions — no range-join explosion, skew bounded by key
    * cardinality like any keyed window.
    *
    * `right` must be unique per (keys, rightTs); pre-aggregate otherwise.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires join keys")
    val leftCols = left.columns.toSeq
    // Carry the right side as ONE struct so `last(ignoreNulls)` skips only
    // genuinely absent right rows, never a present row whose payload happens
    // to be NULL — and so all payload columns always come from the SAME
    // right row (per-column carries could mix rows when values are null).
    val payloadStruct = struct(payload.map(c => col(s"`$c`").as(c)): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("__ts", col(s"`$leftTs`"))
      .withColumn("__side", lit(1))
      .select(
        (keys.map(c => col(s"`$c`")) ++
          Seq(col("__ts"), col("__side")) ++
          leftCols.filterNot(keys.contains).map(c => col(s"`$c`")) :+
          lit(null).cast(payloadType).as("__p")): _*)
    val r = right
      .withColumn("__ts", col(s"`$rightTs`"))
      .withColumn("__side", lit(0))
      .select(
        (keys.map(c => col(s"`$c`")) ++
          Seq(col("__ts"), col("__side")) ++
          leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          payloadStruct.as("__p")): _*)
    val w = Window
      .partitionBy(keys.map(c => col(s"`$c`")): _*)
      .orderBy(col("__ts").asc, col("__side").asc) // right (0) before left (1) at ties
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(c => col(s"`$c`")) ++
        payload.map(c => col(s"`__p`.`$c`").as(c))): _*)
  }

  /** Skew-safe equi-join: scatter the big side's rows across `salt`
    * sub-keys (deterministically, from a row hash — safe under task retry)
    * and replicate the small side once per sub-key, so ONE hot join key
    * spreads over `salt` tasks instead of melting a single reducer.
    * Result identical to `big.join(small, keys, how)`; use for the
    * residual skew AQE's skew-join handling cannot split (e.g. when the
    * skewed side must aggregate after the join). `how` ∈ inner/left
    * (big = left side).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int,
      how: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(how == "inner" || how == "left", s"saltedJoin supports inner/left, got '$how'")
    val b = big.withColumn("__salt",
      pmod(xxhash64(big.columns.toSeq.map(c => col(s"`$c`")): _*), lit(salt)).cast("int"))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "__salt", how).drop("__salt")
  }

  /** Range (interval) join: left rows whose `leftTs` falls in
    * `[right.startCol, right.endCol)` for the same keys.
    *
    * Plan shape: both sides are chunked on a fixed `chunk` granularity —
    * each left row lands in exactly ONE chunk, each right interval explodes
    * to its overlapping chunks — then an ordinary hash equi-join on
    * (keys, chunk) plus the exact residual range filter. This turns the
    * non-equi condition Spark would execute as a broadcast-nested-loop /
    * cartesian into one keyed shuffle; chunk amplification is
    * `interval_length / chunk`, so pick `chunk` near the typical interval
    * length. No dedup pass is needed: a (left, right) pair can only meet in
    * the left row's single chunk.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      startCol: String,
      endCol: String,
      chunk: Long): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    require(keys.nonEmpty, "rangeJoin requires join keys")
    val l = left.withColumn("__chunk", expr(s"`$leftTs` DIV $chunk"))
    val r = right
      .filter(col(s"`$endCol`") > col(s"`$startCol`")) // empty intervals match nothing
      .withColumn("__chunk",
        explode(sequence(expr(s"`$startCol` DIV $chunk"), expr(s"(`$endCol` - 1) DIV $chunk"))))
    l.join(r, keys :+ "__chunk")
      .filter(col(s"`$leftTs`") >= col(s"`$startCol`") && col(s"`$leftTs`") < col(s"`$endCol`"))
      .drop("__chunk")
  }
}
