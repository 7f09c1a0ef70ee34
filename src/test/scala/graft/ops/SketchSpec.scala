package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimates never undercount; exact when the sketch is collision-free") {
    val words = (1 to 200).map(i => (s"tok$i", (i % 7 + 1).toLong)).toDF("word", "freq")
    val exact = words.as[(String, Long)].collect().toMap
    val est = Sketch.estimate(
        Sketch.countMin(words, "word", col("freq"), depth = 4, width = 8192),
        words.withColumnRenamed("freq", "exact"), "word", depth = 4, width = 8192)
      .select("word", "est_cnt").as[(String, Long)].collect().toMap
    est.foreach { case (w, e) => assert(e >= exact(w), w) }
    // 200 tokens into 4 rows of 8192 buckets: overwhelmingly collision-free,
    // and min-over-rows needs only ONE clean row — the estimates are exact
    assert(est === exact)
  }

  test("collisions overcount, min-over-rows bounds the damage; unseen tokens estimate >= 0") {
    // width 2: every bucket collides — estimates must still be >= exact
    val words = Seq(("a", 10L), ("b", 3L), ("c", 1L)).toDF("word", "freq")
    val sk = Sketch.countMin(words, "word", col("freq"), depth = 4, width = 2)
    val est = Sketch.estimate(sk,
        Seq("a", "b", "c", "never_seen").toDF("word"), "word", depth = 4, width = 2)
      .as[(String, Long)].collect().toMap
    assert(est("a") >= 10L && est("b") >= 3L && est("c") >= 1L)
    assert(est.values.forall(_ <= 14L)) // no counter exceeds the total mass
    assert(est("never_seen") >= 0L)
  }

  test("linearity: sketch of pre-aggregated counts equals sketch of the raw stream") {
    val raw = Seq("x", "x", "x", "y", "y", "z").toDF("word").withColumn("w", lit(1L))
    val agg = raw.groupBy("word").agg(count(lit(1)).as("w"))
    val a = Sketch.countMin(raw, "word", col("w"), depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    val b = Sketch.countMin(agg, "word", col("w"), depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(a === b)
    val c = Sketch.countMin(agg.repartition(5), "word", col("w"), depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(c === a)
  }

  test("native cms_estimate equals the join-based estimate on every token") {
    // the heavyHitters prefilter's codegen'd lookup must reproduce the
    // build-side hash math exactly — cross-validated against the
    // independent join-based estimate() over a collision-heavy sketch
    val words = (1 to 300).map(i => (s"tok$i", (i % 13 + 1).toLong)).toDF("word", "freq")
    val sk = Sketch.countMin(words, "word", col("freq"), depth = 4, width = 64)
    val joinEst = Sketch.estimate(sk, words.select("word"), "word", depth = 4, width = 64)
      .as[(String, Long)].collect().toMap
    val arr = Array.ofDim[Long](4 * 64)
    sk.collect().foreach(r => arr(r.getInt(0) * 64 + r.getLong(1).toInt) = r.getLong(2))
    val native = words.select(col("word"),
        org.apache.spark.sql.GraftBridge.column(graft.functions.CmsEstimate(
          org.apache.spark.sql.GraftBridge.expression(col("word")), arr, 4, 64)).as("e"))
      .as[(String, Long)].collect().toMap
    assert(native === joinEst)
  }

  test("heavyHitters equals the exact aggregation; collision-inflated candidates die at verify") {
    val tokens = (Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 30).map(i => s"cold$i")).toDF("word")
    val exact = tokens.groupBy("word").count()
      .where(col("count") >= 20).as[(String, Long)].collect().toSet
    // width 2 forces collisions: every candidate estimate is inflated, so
    // the prefilter passes false candidates — the exact verify must kill
    // them and reproduce the exact answer anyway
    val got = Sketch.heavyHitters(tokens, "word", threshold = 20, depth = 4, width = 2)
      .as[(String, Long)].collect().toSet
    assert(got === exact)
    assert(got === Set(("hot", 50L), ("warm", 20L)))
    // and at a comfortable width the prefilter itself is already tight
    val wide = Sketch.heavyHitters(tokens, "word", threshold = 20, depth = 4, width = 8192)
      .as[(String, Long)].collect().toSet
    assert(wide === exact)
  }

  test("sketches merge: batch sketches summed bucket-wise equal the union sketch") {
    // linearity again, but as the STREAMING property: per-micro-batch
    // sketches union + re-sum to the full-corpus sketch — state is always
    // depth×width however many batches arrive
    val b1 = Seq(("a", 2L), ("b", 1L)).toDF("word", "w")
    val b2 = Seq(("a", 3L), ("c", 4L)).toDF("word", "w")
    val merged = Sketch.countMin(b1, "word", col("w"), 4, 64)
      .unionByName(Sketch.countMin(b2, "word", col("w"), 4, 64))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val full = Sketch.countMin(b1.unionByName(b2), "word", col("w"), 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === full)
  }

  test("HASH64/MIX64 columns match the driver-side Dedup functions") {
    val df = Seq("alpha", "Beta tok", "").toDF("s")
    val got = df.select(col("s"),
        graft.functions.CdcExpressions.hash64(col("s")).as("h"),
        graft.functions.CdcExpressions.mix64(
          graft.functions.CdcExpressions.hash64(col("s"))).as("m"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (s, h, m) =>
      assert(h === Dedup.hash64(s))
      assert(m === Dedup.mix64(Dedup.hash64(s)))
    }
  }
}
