package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq((1L, 100L), (2L, 250L), (3L, 900L)).toDF("lid", "t")
  private def right = Seq((10L, 50L), (11L, 100L), (12L, 240L), (13L, 800L)).toDF("rid", "t")

  test("binned join matches exactly the (lower, upper] window") {
    // window: r.t ∈ (l.t - 100, l.t]
    val out = RangeJoin.binned(left, right, on = "t", lower = -100L, upper = 0L)
      .select("lid", "r_rid").orderBy("lid", "r_rid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(out === Seq(
      (1L, 10L), (1L, 11L),  // 50 and 100 ∈ (0, 100]
      (2L, 12L),             // 240 ∈ (150, 250]; 100 excluded (not > 150)
      (3L, -1L)))            // nothing in (800, 900] — 800 excluded (exclusive lower)
  }

  test("keys restrict matches; bin boundaries are exact at epoch magnitudes") {
    val base = 1704067200000000L // 2024-01-01 in µs — double division would misbin here
    val l = Seq(("a", 1L, base + 100L), ("b", 2L, base + 100L)).toDF("k", "lid", "t")
    val r = Seq(("a", 10L, base + 60L), ("b", 11L, base + 260L)).toDF("k", "rid", "t")
    val out = RangeJoin.binned(l, r, on = "t", lower = -100L, upper = 0L, keys = Seq("k"))
      .select("lid", "r_rid").orderBy("lid")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq
    assert(out === Seq((1L, 10L), (2L, -1L))) // key b's only right row is outside the window
  }

  test("TIMESTAMP on-columns use microsecond windows, not truncated seconds") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val l = Seq((1L, ts(10_000))).toDF("lid", "t")
    val r = Seq((10L, ts(9_600)), (11L, ts(9_400))).toDF("rid", "t")
    // 500 ms window: the 400ms-old row matches, the 600ms-old row does not —
    // second-truncated ordinals would put BOTH at age 0 and match both
    val out = RangeJoin.binned(l, r, on = "t", lower = -500_000L, upper = 0L)
      .select("lid", "r_rid")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq
    assert(out === Seq((1L, 10L)))
  }

  test("plan shape: equi-join on bins, no nested loop or cartesian") {
    val plan = RangeJoin.binned(left, right, on = "t", lower = -100L, upper = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
