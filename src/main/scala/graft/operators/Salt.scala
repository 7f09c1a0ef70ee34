package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted replicated join.
  *
  * For a join key with pathological skew (one customer id holding 1% of a
  * 100 TB fact table), a plain shuffle join puts the whole hot key in one
  * reducer. Salting splits the hot key `buckets` ways: the big side gets a
  * random-but-deterministic salt in [0, buckets), the small side is
  * replicated once per salt value, and the join key becomes (key, salt) —
  * reducer load shrinks by ~buckets at the cost of replicating the small
  * side `buckets`×.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.*`, on by default)
  * handles most cases at runtime; this helper is for the planned-ahead case —
  * known-hot keys, or sort-merge joins AQE can't split (e.g. followed by a
  * bucketed write).
  */
object Salt {

  val SaltCol = "__salt"

  /** Join `big ⋈ small` on `keys`, salting `buckets` ways. Inner joins only
    * (replication makes outer semantics subtle — extend deliberately).
    */
  def skewJoin(big: DataFrame, small: DataFrame, keys: Seq[String], buckets: Int): DataFrame = {
    require(buckets > 1, "need at least 2 salt buckets")
    // deterministic per-row salt: hash of the whole row modulo buckets —
    // distributes a hot key's rows uniformly without an RNG (reproducible)
    val bigSalted = big.withColumn(SaltCol,
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(buckets.toLong)).cast("int"))
    val smallSalted = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallSalted, keys :+ SaltCol).drop(SaltCol)
  }

  /** Two-phase aggregation for high-cardinality-skewed `count distinct`-style
    * workloads: pre-aggregate on (keys, salt), then merge. For algebraic
    * aggregates Spark's partial aggregation already does this map-side; use
    * this for aggregates that buffer per group (collect_list/percentiles).
    */
  def saltedTwoPhase(df: DataFrame, keys: Seq[String], buckets: Int)(
      phase1: (DataFrame, Seq[String]) => DataFrame,
      phase2: (DataFrame, Seq[String]) => DataFrame): DataFrame = {
    val salted = df.withColumn(SaltCol,
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(buckets.toLong)).cast("int"))
    val partial = phase1(salted, keys :+ SaltCol)
    phase2(partial, keys).drop(SaltCol)
  }
}
