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

  test("hot key: 10⁶ step events fold in constant memory (no collect_list)") {
    import org.apache.spark.sql.functions._
    // one bot key emitting a million view events around a single real
    // conversion: the old array fold built a 10⁶-struct aggregation
    // buffer here; the chain-of-mins design keeps every buffer O(1)
    val bot = spark.range(1000000L).select(
      lit(9L).as("user_id"), (col("id") * 3 + 1000).as("ts"), col("id").as("seq"),
      lit("view").as("etype"))
    val real = Seq(
      (9L, 500L, 2000000L, "signup"),      // first signup at ts 500
      (9L, 7L, 2000001L, "purchase"),      // before everything: never counts
      (7L, 1L, 2000002L, "signup"))        // control key: stage 1
      .toDF("user_id", "ts", "seq", "etype")
    val df = Funnel.stages(bot.unionAll(real),
      "user_id", "ts", "seq", "etype", steps, gapUs = 600L)
    assert(!df.queryExecution.executedPlan.toString.contains("collect_list"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // signup@500 → first view strictly after is ts 1000 ≤ 500+600 → stage 2;
    // no purchase after the view → stays 2
    assert(got == Map(9L -> 2L, 7L -> 1L))
  }

  test("funnel length is capped against job-storm misuse") {
    val err = intercept[IllegalArgumentException] {
      Funnel.stages(Seq((1L, 1L, 1L, "a")).toDF("user_id", "ts", "seq", "etype"),
        "user_id", "ts", "seq", "etype", (1 to 17).map("s" + _), 10L)
    }
    assert(err.getMessage.contains("16"))
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
