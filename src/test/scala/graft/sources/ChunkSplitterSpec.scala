package graft.sources

import graft.SparkSpec

class ChunkSplitterSpec extends SparkSpec {
  import ChunkSplitter._

  test("even ranges tile min..max with open ends") {
    val r = evenRanges(Stats(0, 99, 100), chunkSize = 25)
    assert(r.head._1.isEmpty && r.last._2.isEmpty)
    // consecutive ranges share boundaries (half-open, lossless)
    r.sliding(2).foreach { case Seq((_, hi), (lo, _)) => assert(hi === lo); case _ => }
    assert(predicates("k", r).head === "k < 25")
  }

  test("distribution factor detects uneven keys") {
    assert(isEvenlyDistributed(Stats(0, 99, 100)))        // factor 1
    assert(!isEvenlyDistributed(Stats(0, 1000000, 100)))  // sparse keys
  }

  test("chunked parquet read is lossless") {
    val path = s"$sf/lineitem.parquet"
    val base = spark.read.parquet(path)
    val chunked = ChunkSplitter.chunkedRead(spark, path, "l_orderkey", chunkSize = 500)
    assert(chunked.count() === base.count())
  }

  test("quantile ranges balance rows under key skew") {
    import spark.implicits._
    // sparse, skewed key space: 90% of rows in [0,100), outliers to 10^9
    val keys = ((1 to 900).map(_ % 100L) ++ (1 to 100).map(_ * 10000000L)).zipWithIndex
    val df = keys.map { case (k, i) => (k, i) }.toDF("k", "v")
    val ranges = quantileRanges(df, "k", numChunks = 4)
    val preds = predicates("k", ranges)
    val counts = preds.map(p => df.where(p).count())
    assert(counts.sum === 1000) // lossless
    assert(counts.max <= 600)   // even split by VALUE would put ~900 in one chunk
  }

  test("maxChunks caps plan width for huge tables") {
    val preds = predicates("k", evenRanges(Stats(0, 10000000, 10000000), chunkSize = 8096))
    assert(preds.length > 256) // uncapped would explode
    val df = spark.range(0, 100000).toDF("k")
    assert(planFromDataFrame(df, "k", chunkSize = 10, maxChunks = 16).length <= 17)
  }
}
