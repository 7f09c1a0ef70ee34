package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over a corpus-derived source graph — the web-curation
  * reputation prior (PageRank over the host graph is how Common Crawl ranks
  * hosts; CCNet/RefinedWeb-style pipelines consume such a prior as a
  * per-source quality signal alongside content rules).
  *
  * Two pieces, with very different scale profiles:
  *
  *  - [[coDupEdges]] derives the graph FROM the corpus: two sources are
  *    linked when they host documents sharing a content-prefix fingerprint
  *    (a mirror/boilerplate network signal). This is the corpus-scale part —
  *    one fingerprint projection + one df-capped self-join, the
  *    decontamination stance: fingerprints shared by more than `dfCap`
  *    documents are boilerplate, and dropping them both denoises the graph
  *    and bounds the per-bucket pair blow-up (≤ dfCap² rows per
  *    fingerprint, never quadratic in the corpus).
  *  - [[pageRank]] iterates on the DERIVED graph: per iteration one
  *    join + one aggregation over slim (src, dst, contrib) rows. Node
  *    count is what matters here (hosts, not documents); the per-node
  *    contribution fold runs in PINNED src order (`array_sort` before the
  *    fold), so rank doubles are bit-identical under any partitioning —
  *    the DSIR/LM stance — and the oracle can replay the exact fold.
  *    In-degree is graph-bounded; a viral hub with 10⁸ in-links would
  *    need the fold split into a two-phase sorted-segment sum, which
  *    changes no math, only the grouping.
  *
  * The reference has no graph operator at all; this implements the
  * published PageRank formulation (Brin & Page 1998, damping 0.85) without
  * the dangling-mass redistribution term: r(v) = (1-d)/N + d·Σ r(u)/deg(u)
  * over in-neighbors u. Edges from [[coDupEdges]] are symmetric, so every
  * node with an edge has deg ≥ 1 and isolated nodes sit at (1-d)/N.
  */
object Graph {

  /** Directed edge list (src, dst) — both directions of every undirected
    * co-fingerprint pair between DISTINCT sources. Deterministic: md5 of
    * the first `prefixLen` chars of the trimmed text, fingerprints with
    * document frequency > `dfCap` dropped as boilerplate.
    */
  def coDupEdges(docs: DataFrame, srcCol: String, textCol: String,
                 prefixLen: Int = 64, dfCap: Int = 50): DataFrame = {
    val fp = docs.select(col(srcCol).as("fp_src"),
        md5(substring(trim(col(textCol)), 1, prefixLen)).as("fp"))
    val kept = fp.join(
      fp.groupBy("fp").agg(count(lit(1)).as("df")).where(col("df") <= dfCap)
        .select("fp"),
      Seq("fp"))
    kept.select(col("fp"), col("fp_src").as("src")).distinct()
      .join(kept.select(col("fp"), col("fp_src").as("dst")).distinct(), Seq("fp"))
      .where(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
  }

  /** Fixed-iteration PageRank. `nodes` is one column `node` (distinct);
    * `edges` is (src, dst), already directed-both-ways if undirected.
    * Returns (node, rank) after `iters` rounds from the uniform start.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val n = nodes.count()
    require(n > 0, "pageRank over an empty node set")
    val base = lit((1.0 - damping) / n.toDouble)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // slim iteration relation: (src, dst, deg) — reused every round
    val ed = edges.join(deg, "src").localCheckpoint()
    var ranks = nodes.select(col("node"), (lit(1.0) / n.toDouble).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"),
          struct(col("src"), (col("rank") / col("deg")).as("c")).as("f"))
      val folded = contribs.groupBy("dst")
        .agg(aggregate(array_sort(collect_list(col("f"))), lit(0.0),
          (acc: Column, f: Column) => acc + f("c")).as("s"))
      ranks = nodes.join(folded, nodes("node") === folded("dst"), "left")
        .select(col("node"), (base + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        // cut the per-iteration lineage, as a deployment would persist
        // ranks between rounds. EAGER on purpose (r19 measured): lazy
        // checkpoints defer materialization but leave every round's join
        // planning against a stats-less LogicalRDD — the contribution
        // joins lose their broadcast and the query read ~1.4x slower
        .localCheckpoint()
    }
    ranks
  }
}
