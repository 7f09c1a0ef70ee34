package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust time-series outlier detection: the median/MAD (Hampel-filter)
  * convention — flag a point when its absolute deviation from the
  * per-series median exceeds `k` × the series' median absolute deviation
  * (Leys et al. 2013, "Detecting outliers: do not use standard deviation
  * around the mean"). Median/MAD are the robust counterparts of mean/σ: a
  * single wild spike inflates σ enough to mask itself, but moves a median
  * not at all — exactly the property an ingest-monitoring alarm needs.
  *
  * Scale design: this runs over an already-AGGREGATED series (buckets ×
  * series keys — e.g. hourly counts per event type), never over raw rows,
  * so the series is orders of magnitude smaller than the corpus that
  * produced it. Both statistics passes aggregate to one row PER SERIES KEY
  * (bounded), and each joins back as a BROADCAST — the series itself is
  * never shuffled. Exact `percentile` sorts within each series group;
  * at an unbounded-cardinality series key, swap in `approx_percentile`
  * (the mergeable sketch) — the two-pass/broadcast-back shape is unchanged.
  *
  * Determinism: on BIGINT series values both engines' interpolated median
  * is the average of two integers — an exact dyadic rational — and every
  * downstream value (|x − med|, its median, k·MAD) stays a small dyadic,
  * so the `>` decision is bit-identical in Spark and the DuckDB oracle
  * (`quantile_cont` is the same type-7 definition as Spark `percentile`).
  *
  * The classic MAD caveat applies: a series where more than half the
  * points share one value has MAD = 0 and every other value flags. That is
  * the convention's documented behavior (it signals "this series is
  * near-constant — deviations ARE anomalies"), not a defect; callers
  * wanting a floor can post-filter on `mad > 0`.
  */
object Anomaly {

  /** Per-`keyCols`-series robust outlier annotation of a
    * (keys, bucket, value) frame: adds `med`, `mad`, and
    * `is_outlier` (= |value − med| > k·MAD). Input rows pass through
    * unchanged otherwise — filter on `is_outlier` for the alarm feed.
    */
  def madOutliers(series: DataFrame, keyCols: Seq[String], valueCol: String,
                  k: Double = 3.0): DataFrame = {
    val keys = keyCols.map(col)
    val med = series.groupBy(keys: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = series.join(broadcast(med), keyCols)
      .withColumn("__adev", abs(col(valueCol) - col("med")))
    val mad = withMed.groupBy(keys: _*)
      .agg(expr("percentile(__adev, 0.5)").as("mad"))
    withMed.join(broadcast(mad), keyCols)
      .withColumn("is_outlier", col("__adev") > lit(k) * col("mad"))
      .drop("__adev")
  }
}
