package graft.ops

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: both-list documents outrank single-list at equal ranks") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "ra")
    val b = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rb")
    val r = Retrieval.rrfFuse(a, b, "doc_id", k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1))
    // doc 2 is in both lists -> highest fused score
    assert(r.head._1 == 2L)
    assert(r.head._2 == (0.0 + 1.0 / (60.0 + 2.0)) + 1.0 / (60.0 + 1.0))
    // single-list docs contribute exactly one reciprocal term
    val m = r.toMap
    assert(m(1L) == (1.0 / (60.0 + 1.0) + 0.0))
    assert(m(4L) == (0.0 + 1.0 / (60.0 + 2.0)))
  }

  test("rrfFuse k-cut breaks exact ties by id") {
    val a = Seq((7L, 1), (5L, 1)).toDF("doc_id", "ra") // same rank -> same score
    val r = Retrieval.rrfFuse(a, Seq.empty[(Long, Int)].toDF("doc_id", "rb"),
      "doc_id", k = 1).collect()
    assert(r.head.getLong(0) == 5L)
  }

  test("ranked assigns row_number by (score desc, id)") {
    val s = Seq((3L, 0.5), (1L, 0.9), (2L, 0.5)).toDF("doc_id", "score")
    val r = Retrieval.ranked(s, "doc_id", "score", "ra")
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("mmr refuses corpus-scale misuse: k and candidate-set caps") {
    val tiny = Seq((1L, 0.9, Seq(1.0f, 0.0f))).toDF("doc_id", "score", "vec")
    val errK = intercept[IllegalArgumentException] {
      Retrieval.mmr(tiny, "doc_id", "score", "vec", k = 100000)
    }
    assert(errK.getMessage.contains("final-rerank"))
    // a candidate frame wider than the rerank cap is refused BEFORE the
    // driver materializes it (the limit bounds the collect itself)
    val wide = spark.range(70000L).selectExpr(
      "id AS doc_id", "CAST(id AS DOUBLE) AS score",
      "array(CAST(1.0 AS FLOAT)) AS vec")
    val errN = intercept[IllegalArgumentException] {
      Retrieval.mmr(wide, "doc_id", "score", "vec", k = 5)
    }
    assert(errN.getMessage.contains("not a rerank set"))
  }

  test("evalMetrics: hand-computed recall/MRR/nDCG on a planted fixture") {
    def frame(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("q_id", "item", "rank")
    // q1: candidate hits truth items at ranks 1 and 3 (of truth {10,20,30})
    // q2: candidate misses everything
    // q3: truth has only 2 items (|truth| < k); candidate finds both,
    //     ranks 2 and 4 — perfect recall, MRR 1/2
    val truth = frame(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 11L, 1),
      (3L, 12L, 1), (3L, 13L, 2))
    val cand = frame(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 30L, 3),
      (2L, 98L, 1),
      (3L, 97L, 1), (3L, 13L, 2), (3L, 96L, 3), (3L, 12L, 4))
    val got = Retrieval.evalMetrics(cand, truth, "q_id", "item", "rank", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val eps = 1e-12
    assert(got(1L)._1 === 2.0 / 3.0) // 2 of 3 truth items found
    assert(got(1L)._2 === 1.0) // first hit at rank 1
    assert(math.abs(got(1L)._3 - (1.0 / lg2(2.0) + 1.0 / lg2(4.0)) /
      (1.0 / lg2(2.0) + 1.0 / lg2(3.0) + 1.0 / lg2(4.0))) < eps)
    assert(got(2L) === ((0.0, 0.0, 0.0))) // lost query scores 0, not absent
    assert(got(3L)._1 === 1.0) // recall denominator is min(k, |truth|)
    assert(got(3L)._2 === 0.5)
    assert(math.abs(got(3L)._3 - (1.0 / lg2(3.0) + 1.0 / lg2(5.0)) /
      (1.0 / lg2(2.0) + 1.0 / lg2(3.0))) < eps)
    // candidate-only queries have no relevant set: dropped, truth drives
    val extra = Retrieval.evalMetrics(
      cand.union(frame((9L, 1L, 1))), truth, "q_id", "item", "rank", k = 5)
    assert(extra.count() === 3)
    // ranks beyond k contribute nothing: q3's rank-4 hit vanishes at k=3
    val k3 = Retrieval.evalMetrics(cand, truth, "q_id", "item", "rank", k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(k3(3L) === 0.5) // only the rank-2 hit remains, denom min(3,2)=2
  }
}
