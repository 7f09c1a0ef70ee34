package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus slices (crawl
  * snapshots, pipeline versions, train vs holdout) — the data-QA gate that
  * catches a broken extractor or a shifted source mix before a training
  * run does.
  *
  * The per-category L1 drift term |a/A − b/B| is kept EXACT by
  * cross-multiplication: |a·B − b·A| over the common denominator A·B —
  * integer products, no doubles on the decision path (the Q22 stance).
  * Products are computed in DECIMAL(38,0): at 100 TB a slice count can
  * reach 10¹²⁺ and the cross-product overflows BIGINT.
  *
  * Scale shape: ONE aggregation bounded by the feature's cardinality
  * (both slices counted in the same pass via conditional counts), then a
  * bounded 1-row totals collect. The corpus is scanned once, shuffled
  * only by feature.
  */
object Drift {

  /** Per-category drift rows: (feature, cnt_a, cnt_b, drift_num) where
    * drift_num = |cnt_a·B − cnt_b·A| (the L1 numerator over denominator
    * A·B). `inA` labels slice membership; every row is in A or B.
    */
  def categoricalDrift(df: DataFrame, feature: Column, inA: Column): DataFrame = {
    val counts = df
      .groupBy(feature.as("feature"))
      .agg(count(when(inA, 1)).as("cnt_a"),
        count(when(!inA, 1)).as("cnt_b"))
    val tot = counts.agg(sum(col("cnt_a")), sum(col("cnt_b"))).head()
    val (ta, tb) = (tot.getLong(0), tot.getLong(1))
    counts.select(col("feature"), col("cnt_a"), col("cnt_b"),
      abs(col("cnt_a").cast("decimal(38,0)") * lit(tb) -
        col("cnt_b").cast("decimal(38,0)") * lit(ta)).as("drift_num"))
  }
}
