package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LatenessSpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-node reference: running max over arrival order. */
  private def naive(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var frontier = Long.MinValue
    rows.sortBy(_._1).map { case (arr, ts) =>
      frontier = math.max(frontier, ts)
      arr -> (frontier - ts)
    }.toMap
  }

  test("withLateness matches the hand trace") {
    val df = Seq((1L, 10L), (2L, 5L), (3L, 20L), (4L, 15L), (5L, 30L), (6L, 25L))
      .toDF("arr", "ts_us")
    val out = Lateness.withLateness(df, "arr", col("ts_us"))
      .select("arr", "late_us").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 5L, 3L -> 0L, 4L -> 5L, 5L -> 0L, 6L -> 5L))
  }

  test("two-phase frontier equals the naive running max across band widths") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (i.toLong, 1000L + rnd.nextInt(400)))
    val expected = naive(rows)
    for (p <- Seq(1, 3, 8)) {
      val out = Lateness.withLateness(rows.toDF("arr", "ts_us"), "arr",
          col("ts_us"), partitions = p)
        .select("arr", "late_us").as[(Long, Long)].collect().toMap
      assert(out === expected, s"partitions=$p")
    }
  }

  test("arrival collisions resolve by tieBreak — total order, deterministic") {
    // two rows share arr=5; tie-break on id orders ts 50 before 10
    val df = Seq((5L, 1L, 50L), (5L, 2L, 10L), (9L, 3L, 20L))
      .toDF("arr", "id", "ts_us")
    val out = Lateness.withLateness(df, "arr", col("ts_us"), tieBreak = Seq("id"))
      .select("id", "late_us").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 40L, 3L -> 30L))
  }

  test("profile buckets against the candidate delays; no single-partition window") {
    val rows = Seq((1L, 100L), (2L, 40L), (3L, 99L), (4L, 101L), (5L, 60L))
    // lateness: 0, 60, 1, 0, 41 → with bounds 0/10/50: buckets 0→2, 10→1, 50→1, -1→1
    val prof = Lateness.profile(rows.toDF("arr", "ts_us"), "arr", col("ts_us"),
        boundsUs = Seq(0L, 10L, 50L))
      .as[(Long, Long)].collect().toMap
    assert(prof === Map(0L -> 2L, 10L -> 1L, 50L -> 1L, -1L -> 1L))
    val plan = Lateness.withLateness(rows.toDF("arr", "ts_us"), "arr", col("ts_us"))
      .queryExecution.executedPlan.toString
    // the window must be partitioned by band — a global ORDER BY window
    // would show an empty partition spec (single-partition execution)
    assert(plan.contains("__pid"))
  }
}
