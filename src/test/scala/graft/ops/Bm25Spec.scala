package graft.ops

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark stream window"),
    (2L, "merge sort join table"),
    (3L, "spark table"),
    (4L, "window window window stream stream spark merge"),
    (5L, "nothing relevant here at all")
  ).toDF("doc_id", "text")

  test("scores match the hand-computed Okapi BM25 on a tiny corpus") {
    val r = Bm25.topK(corpus, "doc_id", "text", "spark merge", k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // docs 1,2,3,4 hit; doc 5 excluded despite k=10
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    // hand-computed: N=5, avgdl=22/5, df(merge)=2, df(spark)=3
    val n = 5.0; val avgdl = 22.0 / 5.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, dl: Double) =
      tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
    // pinned fold order: merge before spark (ascending terms)
    def score(tfMerge: Double, tfSpark: Double, dl: Double) =
      (0.0 + idf(2.0) * w(tfMerge, dl)) + idf(3.0) * w(tfSpark, dl)
    assert(r(1L) == score(0, 2, 4))
    assert(r(2L) == score(1, 0, 4))
    assert(r(3L) == score(0, 1, 2))
    assert(r(4L) == score(1, 1, 7))
    // more query-term mass must outrank less at comparable length
    assert(r(4L) > r(2L))
  }

  test("w(tf=0) contributes zero, so scores reduce to the matching terms") {
    val r = Bm25.topK(corpus, "doc_id", "text", "merge", k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(2L, 4L))
  }

  test("scores are partitioning-invariant (bit-exact)") {
    val a = Bm25.topK(corpus, "doc_id", "text", "spark merge stream", k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Bm25.topK(corpus.repartition(7), "doc_id", "text", "spark merge stream", k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a == b)
  }

  test("top-k cut is deterministic under score ties (id tie-break)") {
    val dup = Seq((10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha beta"))
      .toDF("doc_id", "text")
    val r = Bm25.topK(dup, "doc_id", "text", "alpha", k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(10L, 11L))
  }
}
