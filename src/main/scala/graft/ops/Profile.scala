package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling / data-quality summary — the validation stage of a
  * large-scale pipeline (null rates, cardinalities, value bounds per
  * column), long-format so it feeds dashboards and drift checks directly.
  *
  * ONE pass over the data: a single aggregate computes every column's
  * stats, then a narrow unpivot emits one row per column. With
  * `exact = false` (the default) cardinality is `approx_count_distinct`
  * (HyperLogLog++, mergeable, no extra shuffle) — at 100 TB exact distinct
  * per column forces an Expand ×#cols blowup; keep exact for tests/oracles
  * only.
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def distinctOf(c: String): Column =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    // one shared row count — not one per column (identical aggregate buffers
    // would each be evaluated per row)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        distinctOf(c).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n"),
        col(s"__null_$c").cast("long").as("n_null"),
        col(s"__dist_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"))
    }
    one.select(explode(array(perCol: _*)).as("__p")).select("__p.*")
  }
}
