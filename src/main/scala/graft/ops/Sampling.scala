package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible subset stage of a
  * training-data pipeline (prompt-mandated extension; absent from the
  * reference).
  *
  * `df.sample()` is seed-dependent per partitioning and not reproducible
  * across engines or re-runs over re-partitioned data; hashing the KEY is:
  * a row's fate depends only on its key, so samples are stable under
  * re-partitioning, resumable, and consistent between engines. The hash is
  * an md5 hex prefix compared lexicographically — exactly replicable in any
  * engine with md5 (rate granularity 1/65536), and a narrow codegen'd
  * projection: no shuffle, scan-bound at 100 TB.
  */
object Sampling {

  /** Keep predicate: 4-hex-char md5 prefix under the rate threshold.
    * Equal-width lowercase hex compares lexicographically == numerically,
    * in any engine; rate granularity 1/65536.
    */
  def keep(key: Column, rate: Double): Column = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    val t = math.round(rate * 65536)
    if (t >= 65536) lit(true)
    else if (t <= 0) lit(false)
    else substring(md5(key.cast("string")), 1, 4) < lit(f"$t%04x")
  }

  /** Uniform deterministic sample at `rate`. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(keep(key, rate))

  /** Stratified deterministic sample: per-stratum rates (e.g. downsample
    * over-represented languages), `defaultRate` for unlisted strata.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val cond = rates.foldLeft(when(lit(false), lit(false))) {
      case (w, (s, r)) => w.when(stratum === s, keep(key, r))
    }.otherwise(keep(key, defaultRate))
    df.where(cond)
  }

  /** Disjoint deterministic train/val/test split: the key's md5-prefix
    * value falls into one of the cumulative-weight bands, so every row has
    * exactly one split, membership is stable under re-partitioning and
    * re-runs, and the assignment is replicable in any engine with md5.
    * Same 1/65536 rate granularity as [[keep]]. A NULL key yields a NULL
    * split (the caller decides the policy), matching [[keep]]'s null-drop
    * stance rather than silently dumping null-keyed rows into one band.
    */
  def splitColumn(key: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $weights")
    val prefix = substring(md5(key.cast("string")), 1, 4)
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val bands = weights.map(_._1).zip(cum.map(c => math.round(c * 65536)))
    val banded = bands.init.foldLeft(when(lit(false), lit(""))) {
      // a band whose bound rounds to 65536 would format as 5-char "10000"
      // and break the 4-char lexicographic compare (keep() has the same
      // guard): such a band swallows everything remaining
      case (w, (name, hi)) =>
        if (hi >= 65536) w.when(lit(true), name)
        else w.when(prefix < lit(f"$hi%04x"), name)
    }.otherwise(bands.last._1)
    when(key.isNull, lit(null).cast("string")).otherwise(banded)
  }

  /** Deterministic global shuffle — the epoch-shuffle stage of a training
    * pipeline: rows ordered by `xxhash64(key)`, with `shuffle_pos` the exact
    * 0-based rank in that order. Reproducible across runs, engines, and
    * partitionings (a row's position depends only on its key).
    *
    * Scale shape: the hash ordering lands via `repartitionByRange` +
    * within-partition sort (parallel range exchange, no global sort node),
    * and the rank comes from [[Pack.withOffsets]]'s two-phase prefix sum —
    * no single-partition window, O(partitions) bytes to the driver.
    */
  def deterministicShuffle(df: DataFrame, key: Column): DataFrame =
    // key as tie-break: hash collisions (certain at billions of rows) must
    // not make the order — and therefore positions — partition-dependent
    Pack.withOffsets(df.withColumn("__h", xxhash64(key))
        .withColumn("__k", key), "__h", lit(1L), tieBreak = Seq("__k"))
      .withColumnRenamed("__start", "shuffle_pos")
      .drop("__h", "__k", "__tok")
}
