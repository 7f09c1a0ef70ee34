package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — combining a lexical ranking (BM25) with a
  * semantic ranking (embedding cosine) by Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher 2009): rrf(d) = Σ_lists 1/(c + rank_list(d)).
  *
  * RRF is the standard fusion for RAG stacks precisely because it consumes
  * only RANKS: the two scorers' incomparable score scales never meet, and
  * determinism reduces to rank determinism (both rankers here break ties
  * by id), after which the fused doubles are exact functions of small
  * integers — bit-identical on any engine.
  *
  * Scale shape: each ranked list is already top-k-bounded (its own
  * `TakeOrderedAndProject`), so the fusion join touches ≤ 2k rows — driver
  * scale, no corpus contact.
  */
object Retrieval {

  /** Rank the rows of a bounded scored list: row_number over
    * (score desc, id) — the single-partition window is fine BECAUSE the
    * input is top-k-bounded, never corpus-scale.
    */
  def ranked(scored: DataFrame, idCol: String, scoreCol: String,
             rankName: String): DataFrame =
    scored.select(col(idCol),
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol)))
        .as(rankName))

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
    * diversify a BOUNDED candidate list: iteratively pick
    * argmax λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s), ties by id.
    *
    * Sequential argmax is not SQL-expressible (the BPE-merge stance), so
    * this runs on the driver over the COLLECTED candidates — legitimate
    * because MMR is always post-top-k (candidates are the previous stage's
    * bounded rerank set, never the corpus); the corpus-scale work already
    * happened in the retrieval that produced them. Returns
    * (id, mmr_rank, rel) rows in selection order.
    */
  def mmr(candidates: DataFrame, idCol: String, scoreCol: String,
          vecCol: String, k: Int, lambda: Double = 0.7): DataFrame = {
    // Deliberate driver computation — guarded so "post-top-k" stays true
    // by construction, not convention: the O(k·n) pairwise argmax and the
    // collect() below are only legitimate on a rerank-sized list. A
    // caller wiring the raw corpus (or a 10^6-wide candidate set) through
    // a YAML pipeline must be refused, not silently OOM the driver.
    require(k <= 1024, s"mmr k=$k: MMR is a final-rerank, never a corpus cut")
    val spark = candidates.sparkSession
    import spark.implicits._
    val maxCandidates = 65536
    val rows = candidates.select(col(idCol).cast("long"),
        col(scoreCol).cast("double"), col(vecCol))
      .limit(maxCandidates + 1)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .sortBy { case (id, s, _) => (-s, id) }
    require(rows.length <= maxCandidates,
      s"mmr candidate list exceeds $maxCandidates rows — not a rerank set; " +
        "cut with a distributed top-k (ranked/rrfFuse) first")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) 0.0 else dot / d
    }
    val vecs = rows.map(r => r._1 -> r._3).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val pool = scala.collection.mutable.LinkedHashMap(rows.map(r => r._1 -> r): _*)
    while (selected.size < k && pool.nonEmpty) {
      val best = pool.values.map { case (id, rel, v) =>
        val maxSim = if (selected.isEmpty) 0.0
          else selected.map { case (sid, _) => cos(v, vecs(sid)) }.max
        (id, rel, lambda * rel - (1.0 - lambda) * maxSim)
      }.minBy { case (id, _, m) => (-m, id) }
      selected += ((best._1, best._2))
      pool.remove(best._1)
    }
    selected.zipWithIndex
      .map { case ((id, rel), ix) => (id, ix + 1, rel) }.toSeq
      .toDF(idCol, "mmr_rank", "rel")
  }

  /** Fuse two ranked lists (idCol, ra) and (idCol, rb) into the RRF top-k.
    * A document missing from one list contributes 0 from it (the
    * 1/(c+null) → null → 0 coalesce), the published convention.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              c: Double = 60.0): DataFrame =
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(lit(1.0) / (lit(c) + col("ra").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rb").cast("double")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)

  /** Retrieval-quality metrics: per-query recall@k, MRR@k and binary-gain
    * nDCG@k of a CANDIDATE ranking against a TRUTH ranking — the numbers
    * that decide whether an ANN index's recall/latency point is
    * acceptable before it ships. Standard IR definitions with the truth's
    * top-k as the (binary) relevant set:
    *
    *   recall@k = |cand@k ∩ truth@k| / min(k, |truth@k|)
    *   MRR@k    = 1 / rank of the first candidate in truth@k  (0 if none)
    *   nDCG@k   = Σ_{hits} 1/log2(rank+1)  /  Σ_{i=1..min(k,|truth|)} 1/log2(i+1)
    *
    * The TRUTH drives the output: a query the candidate missed entirely
    * scores 0 across the board instead of silently vanishing (an index
    * returning nothing must look broken, not absent); candidate-only
    * queries have no defined relevant set and are dropped. recall and MRR
    * are exact rationals of small integers (bit-identical on any engine);
    * the DCG log2 sums are IEEE within the gate's 1e-6 tolerance. The
    * IDCG denominators ride as a k-element literal lookup (one double per
    * possible truth size), so no per-row log series is recomputed.
    *
    * Scale shape: both inputs are rank-bounded (≤ k rows per query — the
    * retrieval stage's own top-k did the corpus-scale work), so this is
    * one (query, item) equi-join plus one per-query aggregation, both
    * shuffling only k·|queries| rows; no window, no corpus contact.
    */
  def evalMetrics(candidate: DataFrame, truth: DataFrame, queryCol: String,
                  itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val cand = candidate.where(col(rankCol) <= k)
      .select(col(queryCol), col(itemCol), col(rankCol).cast("long").as("__crank"))
    val tru = truth.where(col(rankCol) <= k)
      .select(col(queryCol), col(itemCol))
    val truSize = tru.groupBy(queryCol).agg(count(lit(1)).as("__tsize"))
    val hits = cand.join(tru, Seq(queryCol, itemCol), "inner")
    val perQuery = hits.groupBy(queryCol).agg(
      count(lit(1)).as("__nhits"),
      min(col("__crank")).as("__first"),
      sum(lit(1.0) / log2(col("__crank").cast("double") + lit(1.0))).as("__dcg"))
    // ascending partial sums of the ideal gain curve — element_at is
    // 1-based, so idcg(j) = Σ_{i=1..j} 1/log2(i+1) for j = min(k, |truth@k|)
    val idcg = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
      .scanLeft(0.0)(_ + _).drop(1).toArray
    truSize.join(perQuery, Seq(queryCol), "left")
      .select(col(queryCol),
        (coalesce(col("__nhits"), lit(0L)).cast("double")
          / least(lit(k.toLong), col("__tsize"))).as("recall"),
        coalesce(lit(1.0) / col("__first"), lit(0.0)).as("mrr"),
        (coalesce(col("__dcg"), lit(0.0))
          / element_at(lit(idcg), least(lit(k), col("__tsize")).cast("int")))
          .as("ndcg"))
  }
}
