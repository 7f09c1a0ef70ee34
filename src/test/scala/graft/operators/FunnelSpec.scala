package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("signup", "view", "purchase")

  private def stagesOf(rows: Seq[(Long, Long, Long, String)],
                       gapUs: Long = 100L): Map[Long, Long] =
    Funnel.stages(rows.toDF("user_id", "ts", "seq", "etype"),
        "user_id", "ts", "seq", "etype", steps, gapUs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stage advances only in order and within the conversion window") {
    val rows = Seq(
      // u1: full conversion inside the window
      (1L, 100L, 1L, "signup"), (1L, 150L, 2L, "view"), (1L, 200L, 3L, "purchase"),
      // u2: view arrives too late (gap 100)
      (2L, 100L, 1L, "signup"), (2L, 250L, 2L, "view"),
      // u3: purchase BEFORE view never counts
      (3L, 100L, 1L, "signup"), (3L, 120L, 2L, "purchase"), (3L, 150L, 3L, "view"),
      // u4: no signup: later steps cannot start the funnel
      (4L, 100L, 1L, "view"), (4L, 110L, 2L, "purchase"))
    val s = stagesOf(rows)
    assert(s == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("the FIRST eligible event advances; later duplicates are ignored") {
    // the first view (ts 150) sets the purchase window; the second view at
    // 260 does NOT extend it — purchase at 260 is within 150+100 though
    val rows = Seq(
      (1L, 100L, 1L, "signup"), (1L, 150L, 2L, "view"),
      (1L, 260L, 3L, "view"), (1L, 240L, 4L, "purchase"))
    assert(stagesOf(rows) == Map(1L -> 3L))
    // purchase at 251..: outside the window anchored at the FIRST view
    val rows2 = Seq(
      (1L, 100L, 1L, "signup"), (1L, 150L, 2L, "view"),
      (1L, 260L, 3L, "view"), (1L, 255L, 4L, "purchase"))
    assert(stagesOf(rows2) == Map(1L -> 2L))
  }

  test("equal timestamps break by seq") {
    // view shares the signup's ts but has a LARGER seq: processed after,
    // and the window check passes (ts <= ts1 + gap), so it advances
    val rows = Seq((1L, 100L, 1L, "signup"), (1L, 100L, 2L, "view"))
    assert(stagesOf(rows) == Map(1L -> 2L))
    // seq SMALLER than the signup's: processed before -> never counts
    val rows2 = Seq((1L, 100L, 2L, "signup"), (1L, 100L, 1L, "view"))
    assert(stagesOf(rows2) == Map(1L -> 1L))
  }

  test("stages are partitioning-invariant") {
    val rows = (1L to 300L).map(i =>
      (i % 7, i * 10, i, steps((i % 5).toInt.min(2))))
    val a = stagesOf(rows, gapUs = 500L)
    val b = Funnel.stages(rows.toDF("user_id", "ts", "seq", "etype").repartition(11),
        "user_id", "ts", "seq", "etype", steps, 500L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
