package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target vocabulary vs off-target vocabulary; raw holds a mix
  private def corpus = Seq(
    (1L, "alpha beta gamma delta alpha beta gamma delta alpha beta"),
    (2L, "alpha beta gamma delta epsilon zeta alpha beta gamma delta"),
    (3L, "noise junk spam clutter noise junk spam clutter noise junk"),
    (4L, "alpha beta noise junk gamma delta spam clutter alpha beta"),
    (5L, "wholly unrelated vocabulary covering separate semantic ground")
  ).toDF("id", "text")

  test("select ranks target-vocabulary docs above off-target docs") {
    val target = corpus.where(col("id").isin(1L, 2L))
    val top = Dsir.select(corpus, target, "id", "text", k = 2)
      .select("id").as[Long].collect().toSet
    assert(top === Set(1L, 2L)) // pure target vocab over mixed over off-target
    val weights = Dsir.importanceWeights(corpus, "id", "text",
      Dsir.fit(target, corpus, "id", "text")).as[(Long, Double)].collect().toMap
    assert(weights(4L) > weights(3L)) // half target vocab beats none
    assert(weights(1L) > weights(4L))
  }

  test("importance weights are partitioning-invariant (fold order is pinned)") {
    val target = corpus.where(col("id").isin(1L, 2L))
    val f = Dsir.fit(target, corpus, "id", "text")
    val a = Dsir.importanceWeights(corpus, "id", "text", f)
      .as[(Long, Double)].collect().toMap
    val b = Dsir.importanceWeights(corpus.repartition(7), "id", "text", f)
      .as[(Long, Double)].collect().toMap
    assert(a === b) // bit-identical, not approximately equal
  }

  test("empty-text docs carry no weight; identical texts tie exactly") {
    val docs = (corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++
      Seq((6L, ""), (7L, "noise junk spam clutter noise junk spam clutter noise junk")))
      .toDF("id", "text")
    val f = Dsir.fit(docs.where(col("id").isin(1L, 2L)), docs, "id", "text")
    val w = Dsir.importanceWeights(docs, "id", "text", f)
      .as[(Long, Double)].collect().toMap
    assert(!w.contains(6L)) // no features, no selection claim
    assert(w(3L) === w(7L)) // same text, bit-identical weight
  }

  test("gumbel selection is deterministic and favors high-weight docs") {
    val target = corpus.where(col("id").isin(1L, 2L))
    val a = Dsir.gumbelSelect(corpus, target, "id", "text", k = 3)
      .select("id").as[Long].collect().toSeq
    val b = Dsir.gumbelSelect(corpus.repartition(5), target, "id", "text", k = 3)
      .select("id").as[Long].collect().toSeq
    assert(a === b)
    assert(a.toSet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)) && a.size === 3)
  }

  test("raw-side fit subsampling keeps totals proportionate to the sample") {
    val big = (0 until 200).map(i =>
      (i.toLong, s"tok${i % 17} tok${i % 11} tok${i % 7} filler words here")).toDF("id", "text")
    val full = Dsir.fit(big.limit(10), big, "id", "text")
    val sampled = Dsir.fit(big.limit(10), big, "id", "text", rawSampleRate = 0.25)
    assert(sampled.rawGrams < full.rawGrams)
    assert(sampled.rawGrams > 0)
    assert(sampled.targetGrams === full.targetGrams) // target side never sampled
  }
}
