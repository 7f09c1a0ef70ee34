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
}
