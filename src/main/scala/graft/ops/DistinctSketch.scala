package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the 100 TB replacement for
  * `COUNT(DISTINCT)`. An exact distinct over a fact table shuffles every
  * distinct value; re-asking at a coarser grouping (per-type → global) or
  * a wider time range re-shuffles the corpus again. The sketch table
  * inverts that: build once per fine-grained cell (dims × shard), persist
  * the sketches (KB each), and answer ANY coarser rollup by merging
  * sketches — bytes proportional to cells, never to rows. This is Spark's
  * native Apache DataSketches HLL surface (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`, Spark 3.5+), the same
  * register-array design as Flajolet's HyperLogLog / Heule et al.'s HLL++
  * ("HyperLogLog in Practice", EDBT 2013).
  *
  * Determinism caveat (measured, not assumed): abstract HLL registers
  * merge by MAX and would be order-invariant, but the DataSketches
  * implementation starts every sketch in an exact coupon-list mode and
  * promotes to dense registers only past a threshold — so the concrete
  * state (and the estimate's last digit) CAN depend on how rows were
  * sharded and ordered. The published error bound (~1.6% RSE at lgK=12)
  * holds regardless; treat the estimate as an interval, never join on
  * it. This is why the bench query is a rows-only check and
  * `DistinctSketchSpec` asserts tolerance bands, not bit equality.
  */
object DistinctSketch {

  /** Build the persisted artifact: one HLL sketch per `dims` cell.
    * Partial aggregation applies (each map task emits one sketch per
    * cell), so the shuffle carries sketches, not values. `lgK` trades
    * size for accuracy: 12 → 4 KB / ~1.6% RSE.
    */
  def buildSketches(df: DataFrame, dims: Seq[String], valueCol: String,
                    lgK: Int = 12): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll sketches up to any SUBSET of the build dims and estimate:
    * lossless union per group, one estimate per output row. Runs over the
    * sketch table — cardinality-bounded, never the corpus.
    */
  def estimate(sketches: DataFrame, dims: Seq[String]): DataFrame =
    sketches.groupBy(dims.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("approx_distinct"))
}
