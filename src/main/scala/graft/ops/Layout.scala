package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data-layout clustering — the multi-dimensional layout
  * optimization of lakehouse OPTIMIZE ZORDER (prompt-mandated extension;
  * the reference has no layout optimizer): interleave the bits of several
  * sort keys so rows close in ANY of the dimensions land close on disk,
  * making parquet min/max row-group and file pruning effective for
  * predicates on every z-dimension, not just the leading sort key.
  *
  * 100 TB shape: the z-value is a narrow codegen'd integer projection
  * (shift/mask arithmetic, no UDF); the layout lands via
  * `repartitionByRange(zvalue)` + within-partition sort — a parallel range
  * exchange (sampled bounds, no global sort node), the standard Spark way
  * to produce disjoint sorted files. Queries then prune: a 2-d box
  * predicate touches only the z-runs intersecting the box (O(√files) for a
  * square box vs ALL files under single-column sort when filtering the
  * second column).
  *
  * Determinism: pure integer bit arithmetic, identical in any engine —
  * the oracle replicates the spread/interleave exactly.
  */
object Layout {

  /** Spread the low 16 bits of `v` so consecutive bits land 2·`ways` apart
    * — the classic Morton bit-twiddle (shift-or-mask pyramid), expressed in
    * Spark integer functions so it stays inside WholeStageCodegen.
    * Magic masks for 2-way interleave of 16-bit values into 32 bits.
    */
  private def spread2(v: Column): Column = {
    val x0 = v.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-dimension Morton z-value over the LOW 16 BITS of two non-negative
    * integer keys (callers range-rank or bucket wider domains first —
    * interleaving raw 64-bit keys would order by the high bits of one key
    * only, exactly the failure z-ordering exists to avoid).
    */
  def zValue2(a: Column, b: Column): Column =
    spread2(a.cast("long")).bitwiseOR(shiftleft(spread2(b.cast("long")), 1))

  /** Rank-normalize a column to [0, `buckets`) — z-ordering wants UNIFORM
    * per-dimension distributions (raw skewed domains waste z-bits on empty
    * regions; Delta's OPTIMIZE ZORDER range-partitions each dimension the
    * same way). NOT a global rank window (single-partition at 100 TB):
    * one `approxQuantile` pass yields `buckets-1` bounds (a bounded driver
    * decision table), and assignment is the codegen'd binary-search
    * [[graft.functions.RangeBucket]] over the scan.
    */
  def rankBucket(df: DataFrame, c: Column, buckets: Int = 256): Column = {
    require(buckets > 1 && buckets <= 65536, s"buckets must be in (1, 65536]: $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = df.select(c.cast("double").as("__v"))
      .stat.approxQuantile("__v", probs, 0.001)
    graft.functions.CdcExpressions.rangeBucket(c.cast("double"), bounds)
  }

  /** Cluster `df` into `numFiles` z-ordered output slices on two
    * dimensions: compute the z-value, range-partition on it (sampled
    * bounds — disjoint sorted slices), and sort within each slice. Writing
    * the result `parquet(...)` yields files whose per-column min/max
    * ranges are tight in BOTH dimensions — the pruning asset.
    */
  def zOrderBy2(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    val z = zValue2(a, b).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
