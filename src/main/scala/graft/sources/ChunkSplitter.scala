package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot chunk planning: split a table into PK-range chunks for parallel
  * snapshot reads.
  *
  * Ports the math of the reference's `JdbcSourceChunkSplitter`
  * (flink-cdc-base/.../assigner/splitter/JdbcSourceChunkSplitter.java:59,327-380,446-520):
  * if the key is evenly distributed (span/rowCount within
  * `chunk-key.even-distribution.factor` bounds, SourceOptions.java:92-116) cut
  * even ranges from min..max; otherwise fall back to row-count-paced chunk
  * ends. First chunk is unbounded below and last unbounded above, so rows
  * landing outside the sampled min/max are never lost.
  *
  * Output is a predicate array — exactly what `spark.read.jdbc(url, table,
  * predicates, props)` takes to create one partition per chunk. On a 1000-
  * executor cluster this is the difference between a single-threaded snapshot
  * and a full-width parallel one.
  */
object ChunkSplitter {

  final case class Stats(min: Long, max: Long, rowCount: Long)

  val DefaultChunkSize = 8096L // scan.incremental.snapshot.chunk.size (SourceOptions.java:41-45)
  val DefaultDistributionFactorUpper = 1000.0d
  val DefaultDistributionFactorLower = 0.05d

  /** True when the even-split fast path applies (JdbcSourceChunkSplitter.java:327-380). */
  def isEvenlyDistributed(stats: Stats,
                          upper: Double = DefaultDistributionFactorUpper,
                          lower: Double = DefaultDistributionFactorLower): Boolean = {
    if (stats.rowCount == 0) return true
    val factor = (stats.max - stats.min + 1).toDouble / stats.rowCount
    factor >= lower && factor <= upper
  }

  /** Even ranges: [null, s1), [s1, s2), ..., [sn, null). Returned as half-open
    * (startInclusive, endExclusive) with None = unbounded.
    */
  def evenRanges(stats: Stats, chunkSize: Long = DefaultChunkSize): Seq[(Option[Long], Option[Long])] = {
    require(chunkSize > 0)
    if (stats.rowCount == 0 || stats.max <= stats.min) return Seq((None, None))
    // dynamic chunk span = chunkSize * distribution factor, like the reference's
    // ChunkUtils.evenlyItemsToSplit: span covers ~chunkSize rows
    val factor = math.max((stats.max - stats.min + 1).toDouble / stats.rowCount, 1e-9)
    val span = math.max((chunkSize * factor).toLong, 1L)
    val cuts = Iterator.iterate(stats.min + span)(_ + span).takeWhile(_ <= stats.max).toSeq
    if (cuts.isEmpty) Seq((None, None))
    else (None +: cuts.map(Option(_))).zip(cuts.map(Option(_)) :+ None)
  }

  /** Ranges → SQL predicates usable by `spark.read.jdbc(..., predicates, ...)`
    * or `DataFrame.where`.
    */
  def predicates(column: String, ranges: Seq[(Option[Long], Option[Long])]): Seq[String] =
    ranges.map {
      case (None, None)         => "1 = 1"
      case (None, Some(hi))     => s"$column < $hi"
      case (Some(lo), None)     => s"$column >= $lo"
      case (Some(lo), Some(hi)) => s"$column >= $lo AND $column < $hi"
    }

  /** Plan chunks from a DataFrame's own key stats (the parquet-replay analog of
    * the reference's `SELECT MIN(k), MAX(k)` + approx row count).
    *
    * `maxChunks` caps the plan width: chunk count should scale with cluster
    * width, not table size — 100 TB with a fixed 8k-row chunk would yield
    * millions of splits (pure scheduler overhead), so the chunk size grows
    * once the table outruns `maxChunks × chunkSize` rows.
    */
  def planFromDataFrame(df: DataFrame, keyColumn: String, chunkSize: Long = DefaultChunkSize,
                        maxChunks: Int = 256): Seq[String] =
    predicates(keyColumn, planRanges(df, keyColumn, chunkSize, maxChunks))

  /** Chunk ranges from a DataFrame's own key stats (one stats pass). */
  def planRanges(df: DataFrame, keyColumn: String, chunkSize: Long = DefaultChunkSize,
                 maxChunks: Int = 256): Seq[(Option[Long], Option[Long])] = {
    import org.apache.spark.sql.functions._
    val row = df.agg(min(col(keyColumn)).cast("long"), max(col(keyColumn)).cast("long"), count(lit(1))).head()
    if (row.isNullAt(0)) return Seq((None, None))
    val stats = Stats(row.getLong(0), row.getLong(1), row.getLong(2))
    val effectiveChunk = math.max(chunkSize, math.ceil(stats.rowCount.toDouble / maxChunks).toLong)
    evenRanges(stats, effectiveChunk)
  }

  /** Uneven-distribution fallback: chunk bounds at key quantiles, so each
    * chunk holds ~equal ROWS even when the key space is sparse/skewed — the
    * Spark-native analog of the reference's `nextChunkEnd` pacing queries
    * (JdbcSourceChunkSplitter.java:446-520), computed in ONE distributed
    * `approxQuantile` pass instead of N round-trips.
    */
  def quantileRanges(df: DataFrame, keyColumn: String, numChunks: Int,
                     relativeError: Double = 0.001): Seq[(Option[Long], Option[Long])] = {
    require(numChunks > 0)
    if (numChunks == 1) return Seq((None, None))
    val probs = (1 until numChunks).map(_.toDouble / numChunks).toArray
    val cuts = df.stat.approxQuantile(keyColumn, probs, relativeError)
      .map(_.toLong).distinct.sorted.toSeq
    if (cuts.isEmpty) Seq((None, None))
    else (None +: cuts.map(Option(_))).zip(cuts.map(Option(_)) :+ None)
  }

  /** Read a table laid out one-chunk-per-partition — the file-replay
    * equivalent of the chunked parallel JDBC snapshot.
    *
    * ONE scan: each row gets its chunk ordinal from a codegen'd CASE over the
    * cut points, then a single narrow repartition groups chunks into
    * partitions. Never a union of filtered re-scans — that is
    * O(chunks × input) (every chunk re-reads the whole file) and unusable at
    * 100 TB. The JDBC production path needs neither scan-tagging nor shuffle:
    * it hands `predicates(...)` to `spark.read.jdbc`, one partition per chunk
    * at the source.
    */
  def chunkedRead(spark: SparkSession, path: String, column: String,
                  chunkSize: Long = DefaultChunkSize, maxChunks: Int = 32): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val base = spark.read.parquet(path)
    val ranges = planRanges(base, column, chunkSize, maxChunks)
    if (ranges.size <= 1) return base
    val cuts = ranges.drop(1).map(_._1.getOrElse(
      throw new IllegalStateException("interior chunk without lower bound")))
    val k = col(column).cast("long")
    val chunkId = cuts.zipWithIndex.foldRight(lit(cuts.size): org.apache.spark.sql.Column) {
      case ((cut, i), rest) => when(k < cut, i).otherwise(rest)
    }
    // range-partition on the ordinal: contiguous chunk→partition assignment
    // (hash-partitioning the ordinal collides ~1/e of partitions empty and
    // piles 2-3 chunks on others — straggler skew)
    base.withColumn("__chunk", chunkId)
      .repartitionByRange(ranges.size, col("__chunk"))
      .drop("__chunk")
  }
}
