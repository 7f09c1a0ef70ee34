package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CdcExpressions

/** fastText-style linear quality classifier INFERENCE (prompt-mandated
  * training-data extension; absent from the reference): score each document
  * with a logistic model over hashed bag-of-n-gram features — the shape of
  * the learned quality filters used to curate LLM pretraining data (a
  * fastText/logistic classifier trained offline to separate reference text
  * from crawl text; Joulin et al. 2016, and the quality-filtering stage of
  * GPT-3/LLaMA-style pipelines). Training happens OFFLINE (a model is a
  * fitted artifact, like an IVF centroid table); the engine's job is
  * deployment-shaped inference:
  *
  *   `logit(d) = bias + (Σ_g w[bucket(g)]) / n_grams`, `score = σ(logit)`.
  *
  * 100 TB shape: featurization is the codegen'd [[graft.functions
  * .NgramBuckets]] and the weight fold is the codegen'd [[graft.functions
  * .BucketWeightSum]] over the SORTED bucket array — the whole score is one
  * narrow scan-bound projection (no shuffle, no join, no UDF); the model
  * ships as a plan reference object (`buckets` doubles, a few KB).
  *
  * Determinism ([[Dsir]]'s stance): sorting the per-doc bucket array pins
  * the IEEE accumulation order regardless of partitioning, and the stub
  * weights are pure hash functions of the bucket id — an engine-replicable
  * oracle can mirror the sum term for term.
  */
object QualityModel {

  /** A fitted linear model over hashed n-gram buckets: `weights(b)` for
    * b ∈ [0, buckets); `maxN` must match the featurizer the model was
    * trained with.
    */
  final case class Model(weights: Array[Double], bias: Double, maxN: Int) {
    require(weights.nonEmpty, "empty weight table")
    def buckets: Int = weights.length
  }

  /** Deterministic STUB model (the [[graft.functions.AiFunctions]] stance:
    * a real trained artifact needs an offline trainer this container does
    * not have — the plumbing around it is real and tested). Each bucket's
    * weight is a pure hash of its id, scaled to [-4, 4]:
    * `mix64(b+1) / 2^63 · 4` — exact binary scaling, so an oracle
    * reproduces the weights bit-for-bit.
    */
  def stubModel(buckets: Int = 4096, bias: Double = 0.0, maxN: Int = 2): Model =
    Model(Array.tabulate(buckets)(b =>
      Dedup.mix64(b + 1L).toDouble / 9223372036854775808.0 * 4.0), bias, maxN)

  /** The production load path: weights from a fitted (bucket, weight) table
    * — a bounded driver collect (`buckets` rows, the IVF-centroid shape).
    * Missing buckets weigh 0 (features the trainer never saw).
    */
  def fromTable(weightsDf: DataFrame, buckets: Int, bias: Double = 0.0,
                maxN: Int = 2): Model = {
    val w = new Array[Double](buckets)
    weightsDf.select(col("bucket").cast("int"), col("weight").cast("double"))
      .collect().foreach(r => w(r.getInt(0)) = r.getDouble(1))
    Model(w, bias, maxN)
  }

  /** (idCol, n_grams, logit) — docs with no features are dropped (no
    * evidence, no quality claim). `logit` is monotone in the probability;
    * thresholding compares logits, so σ never enters the decision path.
    */
  def logits(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val arr = array_sort(CdcExpressions.ngramBuckets(
      col(textCol), model.maxN, model.buckets))
    // emptiness gate as a cheap regex on the RAW text (a word char exists
    // iff the tokenizer emits a gram): `size(bs) > 0` would be pushed
    // below the projection and duplicate the featurize+sort tree per row
    docs.where(col(textCol).rlike("\\w"))
      .select(col(idCol), arr.as("bs"))
      .select(col(idCol), size(col("bs")).cast("long").as("n_grams"),
        (lit(model.bias) + CdcExpressions.bucketWeightSum(col("bs"), model.weights) /
          size(col("bs")).cast("double")).as("logit"))
  }

  /** (idCol, n_grams, score) with `score = σ(logit)` ∈ (0, 1) — for
    * score-weighted sampling ([[Sampling.weightedSample]]) rather than hard
    * thresholds. σ is transcendental: compare [[logits]] when an exact
    * cross-engine decision is needed.
    */
  def scores(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame =
    logits(docs, idCol, textCol, model)
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
      .drop("logit")

  /** Keep documents the model scores at or above `minScore` — the curation
    * filter. The threshold is compared in logit space (exact; no σ).
    */
  def filter(docs: DataFrame, idCol: String, textCol: String, model: Model,
             minScore: Double = 0.5): DataFrame = {
    require(minScore > 0 && minScore < 1, s"minScore must be in (0,1): $minScore")
    val minLogit = math.log(minScore / (1.0 - minScore))
    // single scan, single evaluation: the fused BUCKET_LOGIT call computes
    // featurize→sort→fold→mean once per row inside the filter (null on no
    // features → the comparison is null → dropped)
    docs.where(CdcExpressions.bucketLogit(
      array_sort(CdcExpressions.ngramBuckets(col(textCol), model.maxN, model.buckets)),
      model.weights, model.bias) >= lit(minLogit))
  }
}
