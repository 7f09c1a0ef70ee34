package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-reputation filtering — the C4 / Gopher / RefinedWeb "judge the
  * domain, not the document" curation rule: score each GROUP (source
  * domain, crawl host, feed id) by the fraction of its documents failing a
  * per-document gate, then keep or drop groups WHOLE. A boilerplate farm's
  * occasional good page goes down with it, and a reputable source's odd
  * short page survives — decisions a per-document filter cannot express.
  *
  * Scale shape: the stats pass is one hash aggregation with map-side
  * partials — bytes shuffled are bounded by the number of DISTINCT groups
  * (domains: ~10^7-10^8 at web scale), never the corpus; the keep-set is a
  * slim one-column relation joined back LEFT SEMI under a broadcast hint,
  * so the corpus itself is never shuffled and a skewed mega-source costs
  * nothing (semi join emits each row at most once, no key hotspot — the
  * probe side stays narrow). If the group cardinality ever outgrows a
  * broadcast, drop the hint: the fallback is one corpus shuffle on the
  * group key, and AQE re-picks broadcast whenever the keep-set is small.
  */
object Reputation {

  /** Per-group gate statistics: `total`, `bad_cnt`, and `bad_fraction` =
    * bad_cnt/total — an integer ratio, so the double is bit-identical on
    * every engine and partitioning (no float accumulation).
    */
  def groupStats(df: DataFrame, group: Column, bad: Column): DataFrame =
    df.groupBy(group.as("__group"))
      .agg(count(lit(1)).as("total"), count_if(bad).as("bad_cnt"))
      .withColumn("bad_fraction", col("bad_cnt") / col("total"))

  /** Keep only rows whose group's bad fraction is ≤ `maxBadFraction`. */
  def groupFilter(df: DataFrame, group: Column, bad: Column,
                  maxBadFraction: Double): DataFrame = {
    val keep = groupStats(df, group, bad)
      .where(col("bad_fraction") <= maxBadFraction)
      .select(col("__group"))
    df.join(broadcast(keep), group === col("__group"), "left_semi")
  }
}
