package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CdcExpressions

/** DSIR-style data selection via importance resampling (prompt-mandated
  * training-data extension; absent from the reference) — select raw-corpus
  * documents that look like a small high-quality TARGET corpus, per
  * "Data Selection for Language Models via Importance Resampling"
  * (Xie et al., 2023): hashed bag-of-n-gram features, bucketed unigram+
  * bigram distributions fit on target and raw, and a per-document log
  * importance weight `Σ_g count_d[g]·(ln p̂_target[g] − ln p̂_raw[g])` with
  * add-half smoothing.
  *
  * 100 TB shape: featurization is a narrow codegen'd projection
  * ([[graft.functions.NgramBuckets]]) + explode; both distribution fits are
  * map-side-combinable counts whose output is bounded by `buckets` (a few
  * thousand rows — broadcastable by construction); per-doc bucket counts are
  * one map-side-combinable aggregation of slim integer rows; the weight is
  * computed by joining those counts to the BROADCAST bucket-stats table and
  * folding per document. The only unbounded shuffle carries
  * `(doc_id, bucket, cnt)` triples — bytes/doc bounded by
  * `min(tokens, buckets)·24`, independent of text size; raw text never
  * shuffles. Selection is `TakeOrderedAndProject` (per-partition heaps).
  * The driver holds two scalars (the gram totals).
  *
  * Determinism: the per-doc fold runs over the bucket-sorted counts array
  * in ascending bucket order, so the double accumulation order is fixed
  * regardless of partitioning — an engine-replicable oracle can mirror it
  * term for term.
  */
object Dsir {

  /** (id, bucket) — one row per n-gram OCCURRENCE (counts, not a set). */
  def featurize(df: DataFrame, idCol: String, textCol: String,
                maxN: Int = 2, buckets: Int = 4096): DataFrame =
    df.select(col(idCol),
      explode(CdcExpressions.ngramBuckets(col(textCol), maxN, buckets)).as("bucket"))

  /** Fitted hashed-n-gram distributions: per-bucket target/raw gram counts
    * (full-outer merged, absent → 0) plus the gram totals. `stats` has at
    * most `buckets` rows — broadcast it.
    */
  final case class Fit(stats: DataFrame, targetGrams: Long, rawGrams: Long,
                       maxN: Int, buckets: Int) {
    /** Smoothed log-ratio term of one bucket, shaped for oracle mirroring:
      * `ln((tc + 0.5) / (T + 0.5B)) − ln((rc + 0.5) / (R + 0.5B))`.
      */
    private[ops] def logRatio(tc: Column, rc: Column): Column = {
      val tt = lit(targetGrams.toDouble + 0.5 * buckets)
      val rr = lit(rawGrams.toDouble + 0.5 * buckets)
      log((tc.cast("double") + lit(0.5)) / tt) - log((rc.cast("double") + lit(0.5)) / rr)
    }
  }

  /** Fit target and raw hashed-n-gram distributions. One bounded driver
    * collect (the two gram totals — the same bounded-decision-table shape as
    * [[Sampling.rebalance]]). At 100 TB fit the RAW side on a deterministic
    * subsample (`rawSampleRate` with [[Sampling.keep]] on the id) — the
    * distribution estimate converges long before the full corpus is read;
    * the totals scale with the sample, so the log-ratio smoothing stays
    * proportionate.
    */
  def fit(target: DataFrame, raw: DataFrame, idCol: String, textCol: String,
          maxN: Int = 2, buckets: Int = 4096, rawSampleRate: Double = 1.0): Fit = {
    val rawIn =
      if (rawSampleRate >= 1.0) raw
      else raw.where(Sampling.keep(col(idCol), rawSampleRate))
    val tf = featurize(target, idCol, textCol, maxN, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("tc"))
    val rf = featurize(rawIn, idCol, textCol, maxN, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("rc"))
    val stats = tf.join(rf, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    val totals = stats.agg(sum("tc"), sum("rc")).head()
    Fit(stats, totals.getLong(0), totals.getLong(1), maxN, buckets)
  }

  /** Per-document log importance weight under `fit`: (idCol, weight).
    *
    * Doc bucket counts join the broadcast stats table, collect into a
    * bucket-SORTED integer array per doc, and fold in that fixed order —
    * the double sum is partitioning-invariant and oracle-replicable. Docs
    * with no features (empty text) get weight NULL and are dropped: no
    * evidence, no selection claim.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        fit: Fit): DataFrame = {
    val perDoc = featurize(docs, idCol, textCol, fit.maxN, fit.buckets)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
    val joined = perDoc.join(broadcast(fit.stats), Seq("bucket"), "left")
      .select(col(idCol), struct(col("bucket"), col("cnt"),
        coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("rc"), lit(0L)).as("rc")).as("f"))
    joined.groupBy(col(idCol))
      .agg(array_sort(collect_list(col("f"))).as("fs"))
      .select(col(idCol), aggregate(col("fs"), lit(0.0), (acc, f) =>
        acc + f("cnt").cast("double") * fit.logRatio(f("tc"), f("rc"))).as("weight"))
  }

  /** Top-k selection by importance weight (deterministic DSIR variant):
    * the k raw docs whose hashed-n-gram profile most over-indexes on the
    * target distribution. Ties (identical texts) break by id.
    */
  def select(docs: DataFrame, target: DataFrame, idCol: String, textCol: String,
             k: Int, maxN: Int = 2, buckets: Int = 4096,
             rawSampleRate: Double = 1.0): DataFrame = {
    val f = fit(target, docs, idCol, textCol, maxN, buckets, rawSampleRate)
    importanceWeights(docs, idCol, textCol, f)
      .orderBy(col("weight").desc, col(idCol))
      .limit(k)
  }

  /** Gumbel-top-k resampling key (the paper's sampling-without-replacement
    * estimator, derandomized): `weight + Gumbel(md5(id))` — the noise is a
    * pure function of the id ([[Sampling]]'s engine-reproducible stance), so
    * the sample is stable under re-partitioning and re-runs. 52 md5 bits →
    * u ∈ (0,1), g = −ln(−ln u).
    */
  def gumbelKey(id: Column, weight: Column): Column = {
    val u = (conv(substring(md5(id.cast("string")), 1, 13), 16, 10)
      .cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    weight + -log(-log(u))
  }

  /** Gumbel-top-k DSIR selection: importance-weighted sampling WITHOUT
    * replacement (vs [[select]]'s argmax-k) — diversity-preserving, still
    * fully deterministic.
    */
  def gumbelSelect(docs: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, maxN: Int = 2,
                   buckets: Int = 4096): DataFrame = {
    val f = fit(target, docs, idCol, textCol, maxN, buckets)
    importanceWeights(docs, idCol, textCol, f)
      .select(col(idCol), col("weight"), gumbelKey(col(idCol), col("weight")).as("gkey"))
      .orderBy(col("gkey").desc, col(idCol))
      .limit(k)
  }
}
