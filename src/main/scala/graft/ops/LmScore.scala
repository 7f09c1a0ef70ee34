package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CdcExpressions

/** CCNet-style language-model fluency scoring (prompt-mandated training-data
  * extension; absent from the reference): score each document by the average
  * negative log-probability of its token bigrams under a hashed conditional
  * bigram LM fitted on a high-quality reference corpus, per "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"
  * (Wenzek et al., 2019) — CCNet filters by KenLM perplexity against
  * Wikipedia; the hashed bigram LM is the engine-native analogue (bounded
  * state, no external model artifact), with add-half smoothing:
  * `p(w2|w1) = (c2[b(w1 w2)] + 0.5) / (c1[b(w1)] + 0.5·B)`.
  *
  * 100 TB shape: featurization is the codegen'd [[graft.functions
  * .NgramBuckets]] (unigram and bigram-only calls over the SAME scan) — the
  * model state is two count tables bounded by `buckets` rows each,
  * broadcastable by construction however large the reference corpus is; the
  * only unbounded shuffle carries slim `(doc_id, b1, b12, cnt)` rows
  * (bytes/doc bounded by `min(bigrams, buckets²)·28`, independent of text
  * size); raw text never shuffles. Fit is two map-side-combinable counts.
  *
  * Determinism ([[Dsir]]'s stance): the per-doc fold runs over the
  * (b1, b12)-sorted counts array, so the double accumulation order is fixed
  * regardless of partitioning and an engine-replicable oracle can mirror it
  * term for term.
  */
object LmScore {

  /** (id, b1, b12) — one row per bigram OCCURRENCE: the context unigram's
    * bucket and the bigram's bucket, positionally aligned (unigram i is the
    * left token of bigram i). Docs with fewer than two tokens emit nothing.
    */
  def featurize(df: DataFrame, idCol: String, textCol: String,
                buckets: Int): DataFrame =
    // one codegen'd call, ONE tokenization per row (a zip_with over two
    // NgramBuckets arrays would tokenize three times); pairs unpack from
    // the packed long with exact integer arithmetic
    df.select(col(idCol),
        explode(CdcExpressions.bigramPairBuckets(col(textCol), buckets)).as("p"))
      .select(col(idCol),
        shiftright(col("p"), 32).cast("int").as("b1"),
        col("p").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("b12"))

  /** Fitted hashed bigram LM: per-bucket context (`c1`) and bigram (`c2`)
    * counts — each at most `buckets` rows, broadcast at score time.
    */
  final case class Fit(uniStats: DataFrame, biStats: DataFrame, buckets: Int) {
    /** Smoothed conditional log-prob of one (context, bigram) bucket pair,
      * shaped for oracle mirroring: `ln((c2 + 0.5) / (c1 + 0.5·B))`.
      */
    private[ops] def logProb(c1: Column, c2: Column): Column =
      log((c2.cast("double") + lit(0.5)) /
        (c1.cast("double") + lit(0.5 * buckets)))
  }

  /** Fit the bigram LM on a reference corpus (CCNet's "Wikipedia side").
    * Two bounded map-side-combinable counts; no driver collect.
    */
  def fit(ref: DataFrame, textCol: String, buckets: Int = 65536): Fit = {
    val c1 = ref.select(explode(
        CdcExpressions.ngramBucketsRange(col(textCol), 1, 1, buckets)).as("b1"))
      .groupBy("b1").agg(count(lit(1)).as("c1"))
    val c2 = ref.select(explode(
        CdcExpressions.ngramBucketsRange(col(textCol), 2, 2, buckets)).as("b12"))
      .groupBy("b12").agg(count(lit(1)).as("c2"))
    Fit(c1, c2, buckets)
  }

  /** Per-document fluency: (idCol, n_bigrams, nll) where `nll` is the
    * average negative bigram log-probability (ln-perplexity). Lower = more
    * like the reference corpus. Docs with no bigrams are dropped: no
    * evidence, no fluency claim ([[Dsir.importanceWeights]]'s stance).
    */
  def scoreNll(docs: DataFrame, idCol: String, textCol: String,
               fit: Fit): DataFrame = {
    val perDoc = featurize(docs, idCol, textCol, fit.buckets)
      .groupBy(col(idCol), col("b1"), col("b12")).agg(count(lit(1)).as("cnt"))
    val joined = perDoc
      .join(broadcast(fit.uniStats), Seq("b1"), "left")
      .join(broadcast(fit.biStats), Seq("b12"), "left")
      .select(col(idCol), struct(col("b1"), col("b12"), col("cnt"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2")).as("f"))
    joined.groupBy(col(idCol))
      .agg(array_sort(collect_list(col("f"))).as("fs"))
      .select(col(idCol),
        aggregate(col("fs"), lit(0L), (acc, f) => acc + f("cnt")).as("n_bigrams"),
        (-aggregate(col("fs"), lit(0.0), (acc, f) =>
          acc + f("cnt").cast("double") * fit.logProb(f("c1"), f("c2"))) /
          aggregate(col("fs"), lit(0L), (acc, f) => acc + f("cnt")).cast("double"))
          .as("nll"))
  }

  /** CCNet head selection: the `k` documents most fluent under the
    * reference LM (lowest nll; ties break by id). The full CCNet pipeline
    * buckets by corpus-percentile thresholds — derive those offline from
    * [[scoreNll]] and apply [[perplexityBuckets]].
    */
  def headSelect(docs: DataFrame, ref: DataFrame, idCol: String, textCol: String,
                 k: Int, buckets: Int = 65536): DataFrame =
    scoreNll(docs, idCol, textCol, fit(ref, textCol, buckets))
      .orderBy(col("nll").asc, col(idCol))
      .limit(k)

  /** head/middle/tail labels from explicit nll thresholds (CCNet derives
    * them as corpus perplexity percentiles; they are deployment constants
    * here so labeling stays a narrow scan-bound projection).
    */
  def perplexityBuckets(nll: Column, headBelow: Double, middleBelow: Double): Column =
    when(nll < headBelow, "head")
      .when(nll < middleBelow, "middle")
      .otherwise("tail")
}
