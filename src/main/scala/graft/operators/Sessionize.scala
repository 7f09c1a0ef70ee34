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

  /** Open session carried in group state (bounds in epoch millis). */
  final case class OpenSession(start: Long, end: Long, n: Long)
  /** A closed session, emitted exactly once. */
  final case class ClosedSession(key: Long, session_start: Long, session_end: Long,
                                 n_events: Long)

  /** CUSTOM-STATE streaming sessionization: the `flatMapGroupsWithState`
    * twin of [[sessions]] for when the native `session_window` aggregation
    * cannot express the semantics (here: emit the CLOSED session exactly
    * once, carrying arbitrary accumulated state). Input needs
    * `withWatermark` on `tsCol` — EventTimeTimeout requires it and it
    * bounds state retention.
    *
    * State per key is the list of OPEN islands (sessions the watermark has
    * not sealed yet), merged gaps-and-islands style with each batch's
    * events. A session is emitted ONLY once the watermark passes
    * `end + gap`: an earlier in-stream "proof of closure" (a later event
    * more than `gap` away) is NOT sufficient in Append mode — a
    * late-but-admissible straggler could still arrive between the two
    * islands and bridge them, and the already-emitted session could not be
    * retracted. Sealing on the watermark makes the emitted sessions exactly
    * the batch twin's output under any admissible arrival order.
    *
    * The island list is bounded: every open island satisfies
    * `end + gap > watermark`, so a key holds at most
    * `watermarkDelay / gap + 2` islands — O(1) for any fixed config, slim
    * rows out.
    */
  def streamingSessions(events: DataFrame, key: String, tsCol: String,
                        gapMs: Long): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(gapMs > 0, s"session gap must be positive: $gapMs")
    import org.apache.spark.sql.types._
    events.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"streamingSessions key '$key' must be integral, got $t (a lossy cast " +
          "would silently collapse distinct keys)")
    }
    val spark = events.sparkSession
    import spark.implicits._
    events
      // NO cast on the event-time column: a cast creates a fresh attribute
      // and silently drops the withWatermark tag EventTimeTimeout requires
      .select(col(key).cast("long"), col(tsCol))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[OpenSession], ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: Long, it: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[List[OpenSession]]) =>
          // gaps-and-islands over the sorted INTERVALS (open islands + batch
          // events): a late-but-in-watermark event more than `gap` BEFORE an
          // island is its own earlier island; one within `gap` merges — even
          // when it bridges two islands formed in earlier batches. On a
          // timeout invocation `it` is empty and this is a pure re-seal pass.
          val items = (it.map { case (_, t) => OpenSession(t.getTime, t.getTime, 1L) }
            ++ state.getOption.getOrElse(Nil).iterator).toArray.sortBy(s => (s.start, s.end))
          val islands = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
          var cur: OpenSession = null
          for (s <- items) {
            if (cur == null) cur = s
            else if (s.start > cur.end + gapMs) { islands += cur; cur = s }
            else cur = OpenSession(cur.start, math.max(cur.end, s.end), cur.n + s.n)
          }
          if (cur != null) islands += cur
          // emit ONLY watermark-sealed islands: any event that could still
          // extend or bridge one (ts <= end + gap) would now be dropped as
          // too late, so the emission is final
          val wm = state.getCurrentWatermarkMs()
          val (finished, open) = islands.partition(s => s.end + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(open.toList)
            // earliest possible seal time; guaranteed > wm by the partition
            state.setTimeoutTimestamp(open.map(_.end + gapMs).min)
          }
          finished.iterator.map(s => ClosedSession(k, s.start, s.end, s.n))
      }
  }
}
