package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers flags exactly the hand-computed Hampel outliers") {
    // series "a": med = 6 (avg of 5,7), adevs sorted [1,1,3,3,5,44] → mad = 3,
    // threshold 9 → only the 50 flags. series "b": constant — mad 0, no flags.
    val series = Seq(
      ("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L),
      ("a", 3L, 7L), ("a", 4L, 9L), ("a", 5L, 50L),
      ("b", 0L, 4L), ("b", 1L, 4L), ("b", 2L, 4L))
      .toDF("k", "bucket", "v")
    val out = Anomaly.madOutliers(series, Seq("k"), "v")
      .select("k", "bucket", "v", "med", "mad", "is_outlier")
      .as[(String, Long, Long, Double, Double, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    val a = out.filter(_._1 == "a")
    assert(a.head._4 === 6.0 && a.head._5 === 3.0)
    assert(a.filter(_._6).map(_._3).toSeq === Seq(50L))
    val b = out.filter(_._1 == "b")
    assert(b.head._4 === 4.0 && b.head._5 === 0.0)
    assert(b.forall(!_._6))
  }

  test("MAD-zero convention: any deviation from a near-constant series flags") {
    val series = Seq(("k", 0L, 10L), ("k", 1L, 10L), ("k", 2L, 10L),
      ("k", 3L, 10L), ("k", 4L, 11L)).toDF("k", "bucket", "v")
    val out = Anomaly.madOutliers(series, Seq("k"), "v")
      .where(col("is_outlier")).select("v").as[Long].collect().toSeq
    assert(out === Seq(11L)) // mad = 0, the single off-median point flags
  }

  test("partitioning-invariant and stats joins stay broadcast") {
    val series = (0 until 200).map(i => (s"k${i % 5}", i.toLong, (i * 37 % 101).toLong))
      .toDF("k", "bucket", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Anomaly.madOutliers(df, Seq("k"), "v")
        .select("k", "bucket", "v", "med", "mad", "is_outlier")
        .collect().map(_.toSeq).toSet
    assert(run(series) === run(series.repartition(7)))
    val plan = Anomaly.madOutliers(series, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    // the series is never shuffled for the stats: both join-backs broadcast
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"))
  }
}
