package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time windows + watermarks — absent from the reference (§2.7: its
  * "watermarks" are snapshot-consistency markers, not event time), native in
  * Structured Streaming; verified here as the engine's beyond-parity
  * streaming surface.
  */
class EventTimeWindowSpec extends SparkSpec {
  import spark.implicits._

  test("tumbling window with watermark aggregates by event time and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val windowed = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").cast("string").as("w"), col("event_type"), col("cnt"), col("sum_value"))

    val q = windowed.writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two events in the 10:00 window, one in 11:00
    mem.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
                (ts("2024-01-01 10:40:00"), "click", 2.0),
                (ts("2024-01-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    // batch 2: advance watermark past 10:00+1h+10m so the 10:00 window closes
    mem.addData((ts("2024-01-01 12:30:00"), "view", 7.0))
    q.processAllAvailable()
    // batch 3: a LATE event for the closed 10:00 window — must be dropped
    mem.addData((ts("2024-01-01 10:50:00"), "click", 100.0))
    q.processAllAvailable()
    // close remaining windows so appended results surface
    mem.addData((ts("2024-01-01 15:00:00"), "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_agg")
      .as[(String, String, Long, Double)].collect().toMap2
    // 10:00 click window: the late 100.0 was NOT folded in
    assert(rows(("2024-01-01 10:00:00", "click")) === ((2L, 3.0)))
    assert(rows(("2024-01-01 11:00:00", "view")) === ((1L, 5.0)))
  }

  test("native session_window groups by inactivity gap in streaming mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val sessions = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").cast("string").as("s"),
        col("user_id"), col("n_events"))

    val q = sessions.writeStream.format("memory").queryName("sess_agg")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two events 10 min apart (one session), then a 2h gap (new session)
    mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:10:00"), 1L))
    mem.addData((ts("2024-01-01 12:30:00"), 1L))
    q.processAllAvailable()
    // advance watermark far enough to close every session
    mem.addData((ts("2024-01-01 20:00:00"), 2L))
    mem.addData((ts("2024-01-02 09:00:00"), 2L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_agg")
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(rows(("2024-01-01 10:00:00", 1L)) === 2L) // merged session
    assert(rows(("2024-01-01 12:30:00", 1L)) === 1L) // after the gap
  }

  test("flatMapGroupsWithState sessionization emits each closed session once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val out = graft.operators.Sessionize.streamingSessions(
      mem.toDF().toDF("ts", "user_id").withWatermark("ts", "10 minutes"),
      "user_id", "ts", gapMs = 30 * 60 * 1000L)

    val q = out.writeStream.format("memory").queryName("fmgws_sessions")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two events 10 min apart (one session), then a 2h gap (new one)
    mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:10:00"), 1L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 12:30:00"), 1L)) // 2h gap: a new island opens
    q.processAllAvailable()
    // advance the watermark far past 12:30+30m so the open session times out
    mem.addData((ts("2024-01-01 20:00:00"), 2L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-02 09:00:00"), 2L))
    q.processAllAvailable()
    q.stop()

    def t(s: String) = java.sql.Timestamp.valueOf(s).getTime
    val rows = spark.table("fmgws_sessions")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows.contains((1L, t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00"), 2L)))
    assert(rows.contains((1L, t("2024-01-01 12:30:00"), t("2024-01-01 12:30:00"), 1L)))
    // each closed session appears exactly once
    assert(rows.size === spark.table("fmgws_sessions").count())

    // cross-check against the BATCH twin on the same events (ms ordinals)
    val batch = Seq((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")),
      (1L, t("2024-01-01 12:30:00")), (2L, t("2024-01-01 20:00:00")),
      (2L, t("2024-01-02 09:00:00"))).toDF("user_id", "ms")
    val expected = graft.operators.Sessionize
      .sessions(batch, "user_id", "ms", gap = 30 * 60 * 1000L)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4)).toSet
    // streaming emitted every session the batch twin computes, except any
    // still open at shutdown (user 2's last event never times out)
    assert(rows.subsetOf(expected))
    assert((expected -- rows).forall(_._1 == 2L))
  }

  test("streaming exact dedup drops replays within the watermark horizon") {
    // the streaming twin of Dedup.exact/exactSurvivors for at-least-once
    // ingest feeds: keep first arrival per key; state bounded by watermark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val deduped = mem.toDF().toDF("ts", "doc_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")

    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 1L),
                (ts("2024-01-01 10:02:00"), 2L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 10:05:00"), 1L)) // replay within watermark: dropped
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 10:06:00"), 3L))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("stream_dedup").select("doc_id")
      .as[Long].collect().toSeq.sorted
    assert(ids === Seq(1L, 2L, 3L)) // each key exactly once
  }

  test("late-but-in-watermark event before the open session is its own session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    // 60m watermark keeps a 12:05 straggler admissible while state sits at 12:40
    val out = graft.operators.Sessionize.streamingSessions(
      mem.toDF().toDF("ts", "user_id").withWatermark("ts", "60 minutes"),
      "user_id", "ts", gapMs = 30 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("fmgws_late")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((ts("2024-01-01 12:40:00"), 1L))
    q.processAllAvailable()
    // straggler more than gap BEFORE the open session: a separate session,
    // not a force-merge into [12:40, ...]
    mem.addData((ts("2024-01-01 12:05:00"), 1L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 20:00:00"), 2L)) // advance watermark, time out u1
    q.processAllAvailable()
    mem.addData((ts("2024-01-02 09:00:00"), 2L))
    q.processAllAvailable()
    q.stop()

    def t(s: String) = java.sql.Timestamp.valueOf(s).getTime
    val u1 = spark.table("fmgws_late").as[(Long, Long, Long, Long)]
      .collect().filter(_._1 == 1L).toSet
    assert(u1 === Set((1L, t("2024-01-01 12:05:00"), t("2024-01-01 12:05:00"), 1L),
                      (1L, t("2024-01-01 12:40:00"), t("2024-01-01 12:40:00"), 1L)))
  }

  test("late-but-admissible straggler BRIDGES two open islands into one session") {
    // the Append-mode retraction hazard: had island [12:00] been emitted the
    // moment 12:40 proved a >gap distance, the 12:20 straggler (admissible
    // under the 60m watermark) could not merge them anymore — sealing on the
    // watermark instead yields the batch twin's single session
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val out = graft.operators.Sessionize.streamingSessions(
      mem.toDF().toDF("ts", "user_id").withWatermark("ts", "60 minutes"),
      "user_id", "ts", gapMs = 30 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("fmgws_bridge")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((ts("2024-01-01 12:00:00"), 1L), (ts("2024-01-01 12:40:00"), 1L))
    q.processAllAvailable() // two open islands, 40m apart (> 30m gap)
    mem.addData((ts("2024-01-01 12:20:00"), 1L)) // straggler bridges them
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 20:00:00"), 2L)) // advance watermark, seal u1
    q.processAllAvailable()
    mem.addData((ts("2024-01-02 09:00:00"), 2L))
    q.processAllAvailable()
    q.stop()

    def t(s: String) = java.sql.Timestamp.valueOf(s).getTime
    val u1 = spark.table("fmgws_bridge").as[(Long, Long, Long, Long)]
      .collect().filter(_._1 == 1L).toSet
    assert(u1 === Set((1L, t("2024-01-01 12:00:00"), t("2024-01-01 12:40:00"), 3L)))
  }

  private implicit class Tuple4Ops(rows: Array[(String, String, Long, Double)]) {
    def toMap2: Map[(String, String), (Long, Double)] =
      rows.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
  }
}
