package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join via bin bucketing: pair each left row with the
  * right rows whose order value falls in a window relative to the left's.
  *
  * A naive inequality join has no equi-key, so Spark plans it as a
  * broadcast-nested-loop / cartesian — quadratic and impossible at scale.
  * The bin trick manufactures the equi-key: with bin width = window span,
  * every (l, r) match pair lands within ONE bin of each other, so
  * right rows replicate to the (at most 2) bins they can match from and the
  * join becomes a plain hash/sort-merge equi-join on (bin, keys) with the
  * exact range as a residual condition. Cost: ≤2× right amplification +
  * one shuffle per side — linear, AQE/skew-handled, 100 TB-safe.
  *
  * (The same technique under "bucketing / binning for interval joins" in
  * e.g. Spark range-join optimizations; composed from built-ins per the
  * custom-operator ladder.)
  */
object RangeJoin {

  /** Pairs (l, r) with `r.on ∈ (l.on + lower, l.on + upper]`, optionally
    * also equal on `keys`. Left-outer: unmatched left rows keep nulls.
    *
    * @param on    order column name, present in both frames. Numeric columns
    *              use their own units; TIMESTAMP columns use MICROSECONDS
    *              (a bare long cast would truncate to whole seconds). Exact
    *              integer bin math — safe for ns/µs epochs where double
    *              arithmetic would lose precision.
    * @param lower window lower bound relative to `l.on`, EXCLUSIVE
    * @param upper window upper bound relative to `l.on`, INCLUSIVE
    */
  def binned(left: DataFrame, right: DataFrame, on: String,
             lower: Long, upper: Long, keys: Seq[String] = Nil,
             rightPrefix: String = "r_"): DataFrame = {
    require(upper > lower, s"empty window: ($lower, $upper]")
    val w = upper - lower

    def ordinal(df: DataFrame, c: Column): Column = df.schema(on).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case org.apache.spark.sql.types.TimestampNTZType => unix_micros(c.cast("timestamp"))
      case _ => c.cast("long")
    }

    // bin identity = the bin's START value, pure int64 math (`pmod` floors
    // for negatives too). Never a division: `/` is double division in Spark
    // and misbins boundary values at ns/µs-epoch magnitudes
    def binStart(c: Column): Column = c - pmod(c, lit(w))

    // a right row at position v matches left rows with l.on ∈ [v-upper, v-lower)
    // — a span of exactly one bin width, so only the bins of its two
    // endpoints (≤2 distinct) can contain matching left rows
    val rCols = right.columns.toSeq
    val rBinned = right
      .select(rCols.map(c => col(c).as(s"$rightPrefix$c")) :+
        array_distinct(array(
          binStart(ordinal(right, col(s"$rightPrefix$on")) - upper),
          binStart(ordinal(right, col(s"$rightPrefix$on")) - lower))).as("__bins"): _*)
      .withColumn("__bin", explode(col("__bins")))
      .drop("__bins")

    val lOn = ordinal(left, col(on))
    val rOn = ordinal(right, col(s"$rightPrefix$on"))
    val cond = (binStart(lOn) === col("__bin")) &&
      keys.map(k => col(k) === col(s"$rightPrefix$k")).foldLeft(
        (rOn > lOn + lower) && (rOn <= lOn + upper))(_ && _)
    left.join(rBinned, cond, "left_outer").drop("__bin")
  }
}
