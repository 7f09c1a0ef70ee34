package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (symbol, t, price); trades: (symbol, t, qty)
  private def quotes = Seq(
    ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
    ("B", 3L, 20.0)).toDF("sym", "t", "price")
  private def trades = Seq(
    ("A", 0L, 100L),  // before any quote → null
    ("A", 5L, 200L),  // tie → matches the t=5 quote (inclusive)
    ("A", 7L, 300L),  // between → t=5 quote
    ("B", 9L, 400L),  // after B's only quote
    ("C", 1L, 500L)   // key with no right rows → null
  ).toDF("sym", "t", "qty")

  test("backward as-of attaches the latest right row at or before each left row") {
    val out = AsOfJoin.backward(trades, quotes, on = "t", by = Seq("sym"))
      .orderBy("sym", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(out === Seq(
      ("A", 0L, 100L, None),
      ("A", 5L, 200L, Some(11.0)),
      ("A", 7L, 300L, Some(11.0)),
      ("B", 9L, 400L, Some(20.0)),
      ("C", 1L, 500L, None)))
  }

  test("tolerance nulls out matches older than the bound") {
    val out = AsOfJoin.backward(trades, quotes, on = "t", by = Seq("sym"), tolerance = Some(2L))
      .orderBy("sym", "t")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(out === Seq(
      ("A", 0L, None),
      ("A", 5L, Some(11.0)),   // age 0 ≤ 2
      ("A", 7L, Some(11.0)),   // age 2 ≤ 2
      ("B", 9L, None),         // age 6 > 2
      ("C", 1L, None)))
  }

  test("forward as-of attaches the earliest right row at or after each left row") {
    val out = AsOfJoin.forward(trades, quotes, on = "t", by = Seq("sym"))
      .orderBy("sym", "t")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(out === Seq(
      ("A", 0L, Some(10.0)),   // next quote at t=1
      ("A", 5L, Some(11.0)),   // tie: the t=5 quote (inclusive)
      ("A", 7L, Some(12.0)),   // next at t=9
      ("B", 9L, None),         // B's only quote (t=3) is behind
      ("C", 1L, None)))
  }

  test("brute-force agreement on random inputs (forward)") {
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b", "c")
    val lefts = Seq.fill(100)((keys(rnd.nextInt(3)), rnd.nextInt(500).toLong, rnd.nextLong()))
    val rights = Seq.fill(60)((keys(rnd.nextInt(3)), rnd.nextInt(500).toLong, rnd.nextLong()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val got = AsOfJoin.forward(lefts.toDF("k", "t", "lv"), rights.toDF("k", "t", "rv"),
      on = "t", by = Seq("k"))
      .select("k", "t", "lv", "rv")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getLong(3)))).toSeq.sorted
    val expected = lefts.map { case (k, t, lv) =>
      (k, t, lv, rights.filter(r => r._1 == k && r._2 >= t).sortBy(_._2).headOption.map(_._3))
    }.sorted
    assert(got === expected)
  }

  test("tolerance on TIMESTAMP columns counts microseconds, not seconds") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val l = Seq(("a", 1L, ts(10_000))).toDF("sym", "lid", "t")
    val r = Seq(("a", ts(9_100), 7.0)).toDF("sym", "t", "price") // 900 ms before
    def matched(tolUs: Long): Boolean = {
      val row = AsOfJoin.backward(l, r, on = "t", by = Seq("sym"), tolerance = Some(tolUs)).head()
      !row.isNullAt(row.length - 1)
    }
    assert(!matched(500_000L)) // 500 ms tolerance < 900 ms age → no match
    assert(matched(1_000_000L)) // 1 s tolerance ≥ 900 ms age → match
  }

  test("colliding right payload names get the suffix") {
    val right = quotes.withColumnRenamed("price", "qty") // collides with trades.qty
    val out = AsOfJoin.backward(trades, right, on = "t", by = Seq("sym"))
    assert(out.columns.toSeq === Seq("sym", "t", "qty", "qty_right"))
  }

  test("plan shape: one shuffle, no broadcast-nested-loop") {
    val plan = AsOfJoin.backward(trades, quotes, on = "t", by = Seq("sym"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap splits a key's events into ordered sessions") {
    val ev = Seq(
      (1L, 100L), (1L, 150L), (1L, 400L),   // gap 250 > 200 → new session
      (1L, 500L),
      (2L, 100L)).toDF("k", "t")
    val out = Sessionize.sessions(ev, key = "k", on = "t", gap = 200L)
      .orderBy("k", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out === Seq(
      (1L, 1L, 2L, 100L, 150L),
      (1L, 2L, 2L, 400L, 500L),
      (2L, 1L, 1L, 100L, 100L)))
  }

  test("assign keeps every event and numbers sessions monotonically") {
    val ev = Seq((1L, 10L), (1L, 1000L), (1L, 1010L)).toDF("k", "t")
    val out = Sessionize.assign(ev, key = "k", on = "t", gap = 100L)
      .orderBy("t").select("session_idx").as[Long].collect().toSeq
    assert(out === Seq(1L, 2L, 2L))
  }

  test("agrees with Spark's native session_window on random events") {
    val rnd = new scala.util.Random(11)
    val evs = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong * 1000)).distinct
    val df = evs.toDF("k", "t_ms")
    val gapMs = 30000L

    val ours = Sessionize.sessions(df.selectExpr("k", "t_ms"), "k", "t_ms", gapMs)
      .select(col("k"), col("session_start").as("start_ms"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // native session_window over the same events as timestamps. Note the
    // gap semantics differ by one unit: session_window's window is
    // [t, t+gap) — an event AT exactly t+gap starts a NEW session, while
    // gaps-and-islands `t - prev > gap` keeps it. Use gap+1ms natively.
    val native = df
      .withColumn("ts", timestamp_millis(col("t_ms")))
      .groupBy(session_window(col("ts"), s"${gapMs + 1} milliseconds"), col("k"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("k"), unix_millis(col("session_window.start")).as("start_ms"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(ours === native)
  }
}
