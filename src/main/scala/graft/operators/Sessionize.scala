package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session windows over a keyed event stream (batch shape): group events
  * into activity sessions separated by gaps longer than `gap`.
  *
  * Absent from the reference (no windowing at all, SURVEY.md §2.7); in
  * Spark this is the classic gaps-and-islands pair of window passes —
  * `lag` marks session starts, a running sum numbers them — followed by an
  * ordinary aggregation. The same semantics in streaming mode is Spark's
  * native `session_window(ts, gap)` aggregation; this batch form exists so
  * session features can be backfilled over historical data with ONE shuffle
  * (both window passes and the final groupBy share the `key` partitioning,
  * so Catalyst plans a single exchange).
  */
object Sessionize {

  /** Assign a per-key session ordinal to each event. `on` must be a numeric
    * (e.g. epoch) column; `gap` is in the same units. Timestamp columns:
    * convert first (`unix_micros(ts)`) — passing one raises an analysis
    * error (interval vs long comparison), never a silent unit change.
    */
  def assign(events: DataFrame, key: String, on: String, gap: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(on)
    events
      .withColumn("__prev", lag(col(on), 1).over(byKey))
      .withColumn("__new",
        when(col("__prev").isNull || col(on) - col("__prev") > gap, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("__new").over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Per-session summary: event count and session bounds. */
  def sessions(events: DataFrame, key: String, on: String, gap: Long): DataFrame =
    assign(events, key, on, gap)
      .groupBy(col(key), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(on)).as("session_start"),
        max(col(on)).as("session_end"))
}
