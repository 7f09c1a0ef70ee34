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

  /** (train_id, bench_id, overlap) for every contaminated pair.
    *
    * `maxBroadcastRows`: the exploded bench shingle set is broadcast only
    * when the bench side provably fits — at most this many (bench doc ×
    * shingle) rows, counted before the join (benchmarks are small, so the
    * count is cheap). A degenerate "benchmark" of millions of docs would
    * otherwise blow the driver/executor broadcast limit; past the bound the
    * join falls back to a plain shuffle hash/sort-merge join on `sh`, which
    * is shuffle-heavy but safe at any size.
    */
  def flag(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
           shingleSize: Int = 3, minShingles: Int = 2,
           maxShingleDf: Int = 1000, maxBroadcastRows: Long = 10_000_000L): DataFrame = {
    def shingles(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).cast("long").as(as),
        explode(graft.functions.CdcExpressions.shingleHashes(
          coalesce(col(textCol), lit("")), shingleSize)).as("sh"))

    val benchSh = shingles(bench, "bench_id")
    // stop-shingle cap: document frequency over the BENCH side (small)
    val kept = benchSh
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .where(col("__df") <= maxShingleDf)
      .drop("__df")

    // broadcast decision: probe the pre-filter exploded row count — an upper
    // bound for `kept` that costs one narrow pass over the (small) bench
    // side, no window shuffle, and no lingering persist
    val broadcastable = benchSh.count() <= maxBroadcastRows
    val benchSide = if (broadcastable) broadcast(kept) else kept
    shingles(train, "train_id")
      .join(benchSide, "sh")
      .groupBy("train_id", "bench_id")
      .agg(count_distinct(col("sh")).as("overlap"))
      .where(col("overlap") >= minShingles)
  }
}
