package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the "is my eval set in my training data"
  * check every LLM training pipeline needs (prompt-mandated extension;
  * absent from the reference): flag training documents sharing at least
  * `minShingles` distinct word-n-gram shingles with any benchmark document.
  *
  * Scale shape: shingle sets come from the codegen'd SHINGLE_HASHES
  * expression (narrow, scan-bound); the overlap is ONE equi-join on the
  * 64-bit shingle hash — train-side cost scales with corpus size, bench
  * side is small (benchmarks are), so the join broadcasts. `maxShingleDf`
  * drops stop-shingles appearing in more than that many benchmark docs
  * (boilerplate n-grams would otherwise fan the join out quadratically —
  * the same degenerate-key cap the dedup ops apply).
  */
object Decontaminate {

  private def shingles(df: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int, as: String): DataFrame =
    df.select(col(idCol).cast("long").as(as),
      explode(graft.functions.CdcExpressions.shingleHashes(
        coalesce(col(textCol), lit("")), shingleSize)).as("sh"))

  /** Bench-side exploded shingles with the stop-shingle cap applied: drop
    * shingles present in more than `maxShingleDf` bench docs. The window
    * shuffle runs over the (small) bench side only.
    */
  private def cappedBenchShingles(bench: DataFrame, idCol: String, textCol: String,
                                  shingleSize: Int, maxShingleDf: Int): DataFrame =
    shingles(bench, idCol, textCol, shingleSize, "bench_id")
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .where(col("__df") <= maxShingleDf)
      .drop("__df")

  /** (train_id, bench_id, overlap) for every contaminated pair.
    *
    * `maxBroadcastRows`: the exploded bench shingle set is broadcast only
    * when the bench side provably fits — at most this many (bench doc ×
    * shingle) rows, counted before the join (benchmarks are small, so the
    * count is cheap). A degenerate "benchmark" of millions of docs would
    * otherwise blow the driver/executor broadcast limit; past the bound the
    * join falls back to a plain shuffle hash/sort-merge join on `sh`, which
    * is shuffle-heavy but safe at any size — or, better, [[flagBloom]].
    */
  def flag(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
           shingleSize: Int = 3, minShingles: Int = 2,
           maxShingleDf: Int = 1000, maxBroadcastRows: Long = 10_000_000L): DataFrame = {
    val benchSh = shingles(bench, idCol, textCol, shingleSize, "bench_id")
    val kept = cappedBenchShingles(bench, idCol, textCol, shingleSize, maxShingleDf)

    // broadcast decision: probe the pre-filter exploded row count — an upper
    // bound for `kept` that costs one narrow pass over the (small) bench
    // side, no window shuffle, and no lingering persist
    val broadcastable = benchSh.count() <= maxBroadcastRows
    val benchSide = if (broadcastable) broadcast(kept) else kept
    shingles(train, idCol, textCol, shingleSize, "train_id")
      .join(benchSide, "sh")
      .groupBy("train_id", "bench_id")
      .agg(count_distinct(col("sh")).as("overlap"))
      .where(col("overlap") >= minShingles)
  }

  /** [[flag]] with a Bloom prefilter on the train side — EXACTLY the same
    * output, built for the bench-side regime where broadcasting the shingle
    * set is no longer safe (massive eval suites, or decontaminating corpus
    * A against corpus B).
    *
    * Without the broadcast, `flag` degrades to a shuffle join that moves
    * EVERY train shingle — at 100 TB that shuffle IS the job. Here the
    * bench shingles are folded into a Bloom filter (a bounded driver
    * aggregate: `-n·ln(fpp)/ln²2` bits ≈ 1.2 MB per million shingles at 1%
    * fpp), and the train scan keeps only shingles the filter might contain
    * — evaluated by Spark's codegen'd `BloomFilterMightContain` directly
    * over the scan, the same expression Spark's own runtime row-group
    * filtering injects. Only true matches and the fpp-fraction of false
    * positives reach the exchange; the exact join then annihilates the
    * false positives, so the result is IDENTICAL to [[flag]] — the filter
    * changes the plan, never the answer.
    */
  def flagBloom(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
                shingleSize: Int = 3, minShingles: Int = 2,
                maxShingleDf: Int = 1000, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val kept = cappedBenchShingles(bench, idCol, textCol, shingleSize, maxShingleDf)
    // distributed build over the bench side, merged on the driver; sizing by
    // the exploded pre-distinct count over-allocates bits (never under)
    val expected = math.max(kept.count(), 1L)
    val bloom = kept.stat.bloomFilter("sh", expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    shingles(train, idCol, textCol, shingleSize, "train_id")
      .where(graft.functions.CdcExpressions.bloomMightContain(bytes, col("sh")))
      // deliberately NOT broadcast: this path exists for bench sides past
      // the broadcast budget — the exchange now carries only bloom survivors
      .join(kept, "sh")
      .groupBy("train_id", "bench_id")
      .agg(count_distinct(col("sh")).as("overlap"))
      .where(col("overlap") >= minShingles)
  }
}
