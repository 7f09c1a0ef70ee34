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
}
