package graft.ops

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // three near-duplicate high-relevance vectors + two distinct lower-rel
  private val cands = Seq(
    (1L, 0.99, Array(1.0f, 0.0f, 0.0f)),
    (2L, 0.98, Array(0.999f, 0.01f, 0.0f)),
    (3L, 0.97, Array(0.998f, 0.02f, 0.0f)),
    (4L, 0.80, Array(0.0f, 1.0f, 0.0f)),
    (5L, 0.70, Array(0.0f, 0.0f, 1.0f))
  ).toDF("id", "score", "vec")

  private def pick(lambda: Double, k: Int): Seq[Long] =
    Retrieval.mmr(cands, "id", "score", "vec", k, lambda)
      .orderBy("mmr_rank").collect().map(_.getLong(0)).toSeq

  test("lambda=1 reduces to plain relevance order") {
    assert(pick(1.0, 5) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("diversification skips near-duplicates of already-selected items") {
    // after picking 1, the near-identical 2 and 3 are penalized: the
    // orthogonal 4 and 5 come next despite lower relevance
    assert(pick(0.5, 3) == Seq(1L, 4L, 5L))
  }

  test("first pick is always the relevance argmax; selection is deterministic") {
    for (l <- Seq(0.2, 0.5, 0.9)) assert(pick(l, 1) == Seq(1L))
    assert(pick(0.5, 5) == pick(0.5, 5))
  }

  test("k beyond the candidate count returns every candidate once") {
    val r = pick(0.5, 50)
    assert(r.sorted == Seq(1L, 2L, 3L, 4L, 5L) && r.distinct == r)
  }
}
