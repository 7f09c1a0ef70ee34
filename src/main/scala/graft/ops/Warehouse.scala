package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lakehouse physical-layout primitives — the two levers that decide
  * whether a 100 TB query reads 100 TB or 100 GB:
  *
  *  - **Hive-style partitioned layout** ([[writePartitioned]]): predicates
  *    on the partition column prune at FILE LISTING time — the scan never
  *    opens a non-matching file (`PartitionFilters` in the plan, zero I/O
  *    for pruned partitions). The right home for low-cardinality routing
  *    columns (event type, language, date).
  *  - **Bucketed layout** ([[writeBucketed]]): both join sides pre-hashed
  *    into the same bucket count on the join key makes the join
  *    EXCHANGE-FREE — the shuffle that dominates large fact-fact joins is
  *    paid once at write time and amortized over every subsequent join.
  *    `sortBy` within buckets additionally feeds sort-merge join without a
  *    per-query sort. This is Spark's answer to the co-located join the
  *    reference gets from its hash-by-key `PrePartition` operator
  *    (reference `PrePartitionOperator`), persisted instead of in-flight.
  *
  * Both are thin, deliberate wrappers: the VALUE is the layout contract
  * (and the plan invariants asserting pruning/exchange-freedom), not the
  * code volume.
  */
object Warehouse {

  /** Write `df` Hive-partitioned by `pCol` under `path`. */
  def writePartitioned(df: DataFrame, pCol: String, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(pCol).parquet(path)

  /** Read back a partitioned layout; partition-column predicates prune at
    * listing time.
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a small-file parquet layout (the lakehouse OPTIMIZE): rewrite
    * `path` into ~`targetBytes`-sized files, then atomically swap via
    * rename — readers either see the old layout or the new one, never a
    * mix. Streaming ingest creates one file wave per micro-batch; at 100 TB
    * the file COUNT (listing, footer reads, task scheduling) becomes the
    * scan bottleneck long before the bytes do. Returns (filesBefore,
    * filesAfter). Row identity is untouched — compaction changes layout,
    * never answers (spec-asserted).
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import java.nio.file.{Files, Paths}
    def parquetFiles(p: String): Int = {
      val d = Paths.get(p)
      if (!Files.exists(d)) 0
      else Files.walk(d).filter(f => f.toString.endsWith(".parquet")).count().toInt
    }
    val before = parquetFiles(path)
    val df = spark.read.parquet(path)
    val bytes = Files.walk(Paths.get(path)).filter(_.toString.endsWith(".parquet"))
      .mapToLong(f => Files.size(f)).sum()
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = s"$path.compact-tmp"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = s"$path.compact-old"
    Files.move(Paths.get(path), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(path))
    // best-effort cleanup of the superseded wave
    Files.walk(Paths.get(old)).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    (before, parquetFiles(path))
  }

  /** Write `df` as a bucketed+sorted catalog table on `key` — pair with an
    * equal `buckets` count on the other join side for exchange-free joins.
    *
    * Idempotent across JVMs: a managed table's LOCATION outlives the
    * in-memory catalog (the session dies, the warehouse dir doesn't), and
    * `saveAsTable` refuses to adopt an existing location
    * (LOCATION_ALREADY_EXISTS) — so drop any catalog entry AND clear any
    * stale location before writing.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
                    table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath = wh.stripPrefix("file:")
    val stale = java.nio.file.Paths.get(whPath, table.toLowerCase)
    if (java.nio.file.Files.exists(stale))
      java.nio.file.Files.walk(stale)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
