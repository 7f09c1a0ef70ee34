package graft.ops

import graft.functions.{TDigestAgg, TDigestQuantile, TDigestUnionAgg}
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** Mergeable quantile-sketch tables — the quantile twin of
  * [[DistinctSketch]], completing the sketch family (count-min for
  * frequency, HLL for cardinality, Bloom for membership, MinHash for
  * similarity, t-digest for distribution shape). Exact percentiles over a
  * fact table buffer every value of a group in one reducer and re-shuffle
  * the corpus for every new grouping; the sketch table builds once per
  * fine cell (KB per digest, map-side partials so the shuffle carries
  * digests), persists, and answers ANY coarser rollup — p50/p99 per type,
  * per day, global — by lossless digest union over the cell-bounded table.
  *
  * The monitoring shape this exists for at 100 TB: distribution drift
  * (quantile deltas between corpus snapshots) without ever re-scanning,
  * the same asset discipline as [[Drift]]'s PSI tables.
  */
object QuantileSketch {

  /** Aggregate raw doubles into a digest: `groupBy(...).agg(sketch(col))`. */
  def sketch(value: Column, compression: Int = 100): Column =
    GraftBridge.column(
      TDigestAgg(GraftBridge.expression(value), compression).toAggregateExpression())

  /** Union persisted digests (lossless up-rollup). */
  def union(sk: Column, compression: Int = 100): Column =
    GraftBridge.column(
      TDigestUnionAgg(GraftBridge.expression(sk), compression).toAggregateExpression())

  /** Quantile query over a digest struct column. */
  def quantileOf(sk: Column, q: Double): Column =
    GraftBridge.column(TDigestQuantile(GraftBridge.expression(sk), Literal(q)))

  /** Build the persisted artifact: one digest per `dims` cell. */
  def buildSketches(df: DataFrame, dims: Seq[String], valueCol: String,
                    compression: Int = 100): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(sketch(col(valueCol), compression).as("sketch"))

  /** Incrementally maintain a persisted sketch table: fold a new batch's
    * per-cell digests into the existing table by cell-wise union. Digests
    * under union form a commutative monoid, so incremental maintenance
    * equals the one-shot build within the rank-error bound — the same
    * commuting-delta discipline as [[Bm25]]'s incremental stats growth,
    * and the whole point of the asset: a micro-batch updates the
    * distribution monitor by touching ONLY its own cells, never the
    * corpus. Cells new to the batch appear; untouched state cells pass
    * through (their digest unions with nothing).
    */
  def mergeSketchTables(state: DataFrame, batch: DataFrame, dims: Seq[String],
                        compression: Int = 100): DataFrame =
    state.unionByName(batch).groupBy(dims.map(col): _*)
      .agg(union(col("sketch"), compression).as("sketch"))

  /** Roll sketches up to any SUBSET of the build dims and answer the given
    * quantiles: one output row per (cell, q). Runs over the sketch table —
    * cell-bounded, never the corpus.
    */
  def estimate(sketches: DataFrame, dims: Seq[String], quantiles: Seq[Double],
               compression: Int = 100): DataFrame = {
    val merged = sketches.groupBy(dims.map(col): _*)
      .agg(union(col("sketch"), compression).as("merged"))
    merged.select(dims.map(col) :+ explode(array(quantiles.map(q =>
        struct(lit(q).as("q"), quantileOf(col("merged"), q).as("est"))): _*)).as("e"): _*)
      .select(dims.map(col) :+ col("e.q").as("q") :+ col("e.est").as("est"): _*)
  }
}
