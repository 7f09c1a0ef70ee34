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

  test("maxChunks caps plan width for huge tables") {
    val preds = predicates("k", evenRanges(Stats(0, 10000000, 10000000), chunkSize = 8096))
    assert(preds.length > 256) // uncapped would explode
    val df = spark.range(0, 100000).toDF("k")
    assert(planFromDataFrame(df, "k", chunkSize = 10, maxChunks = 16).length <= 17)
  }
}
