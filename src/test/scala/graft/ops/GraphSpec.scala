package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(nodes: Seq[String], edges: Seq[(String, String)],
                      iters: Int = 5): Map[String, Double] =
    Graph.pageRank(nodes.toDF("node"),
        edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("pageRank matches the hand-computed fixpoint shape on a star") {
    // star: hub h linked symmetrically to a, b, c — hub must outrank leaves,
    // leaves tie exactly (identical in-neighborhoods)
    val sym = Seq("a" -> "h", "b" -> "h", "c" -> "h", "h" -> "a", "h" -> "b", "h" -> "c")
    val r = ranksOf(Seq("a", "b", "c", "h", "iso"), sym)
    assert(r("h") > r("a"))
    assert(r("a") == r("b") && r("b") == r("c"))
    // isolated node sits at exactly (1-d)/N
    val base = (1.0 - 0.85) / 5.0
    assert(r("iso") == base)
    // one-iteration hand check, same left-assoc fold order as the engine:
    // r1(h) = (1-d)/5 + d * fold(contribs of a,b,c), each (1/5)/deg
    val r1 = ranksOf(Seq("a", "b", "c", "h", "iso"), sym, iters = 1)
    assert(r1("h") == base + 0.85 * (((0.0 + 0.2 / 1.0) + 0.2 / 1.0) + 0.2 / 1.0))
    assert(r1("a") == base + 0.85 * (0.0 + 0.2 / 3.0))
  }

  test("pageRank doubles are partitioning-invariant (pinned fold order)") {
    val nodes = (0 until 40).map(i => f"s$i%02d")
    val edges = (for (i <- 0 until 40; j <- 0 until 40
                      if i != j && (i + j) % 3 == 0) yield (f"s$i%02d", f"s$j%02d"))
    val a = ranksOf(nodes, edges)
    val b = Graph.pageRank(nodes.toDF("node").repartition(7),
        edges.toDF("src", "dst").repartition(5), iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b) // bit-exact equality, not approx
  }

  test("coDupEdges links sources sharing a prefix fingerprint; df cap drops boilerplate") {
    val docs = Seq(
      ("s1", "shared mirror page body unique tail one"),
      ("s2", "shared mirror page body unique tail two"),
      ("s3", "totally different content here"),
      // boilerplate prefix hosted by four sources -> df-capped away at dfCap=3
      ("b1", "BOILER"), ("b2", "BOILER"), ("b3", "BOILER"), ("b4", "BOILER")
    ).toDF("source", "text")
    // prefixLen 16 makes the two mirror docs share a fingerprint
    val e = Graph.coDupEdges(docs, "source", "text", prefixLen = 16, dfCap = 3)
      .as[(String, String)].collect().toSet
    assert(e == Set("s1" -> "s2", "s2" -> "s1"))
  }
}
