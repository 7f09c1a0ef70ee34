package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Chunked-parallel JDBC snapshot read — the production entry for the
  * reference's incremental-snapshot phase (SURVEY.md §2.1:
  * `IncrementalSource` snapshot splits → `spark.read.jdbc(predicates)`).
  *
  * Planning runs two cheap queries (min/max+count of the chunk key), then the
  * snapshot reads as `predicates.length` independent partitions — on a
  * 1000-executor cluster the snapshot proceeds at full cluster width, each
  * chunk one bounded range query (the reference's chunk protocol,
  * JdbcSourceChunkSplitter.java:327-380). Consistency note: each chunk reads
  * its own connection snapshot; run against a replica/exported snapshot, or
  * fold concurrent changes via the changelog replay (low/high-watermark
  * normalization, SURVEY.md §7.4) which the upsert sink's last-write-wins
  * dedup performs naturally.
  */
object JdbcSnapshot {

  /** Stats query pushed to the database (one row). */
  def statsQuery(table: String, keyColumn: String): String =
    s"SELECT MIN($keyColumn), MAX($keyColumn), COUNT(*) FROM $table"

  def read(spark: SparkSession, url: String, table: String, keyColumn: String,
           props: Properties = new Properties(),
           chunkSize: Long = ChunkSplitter.DefaultChunkSize,
           maxChunks: Int = 256): DataFrame = {
    val stats = spark.read.jdbc(url, s"(${statsQuery(table, keyColumn)}) AS __stats", props).head()
    if (stats.isNullAt(0)) return spark.read.jdbc(url, table, props)
    val s = ChunkSplitter.Stats(
      stats.getAs[Number](0).longValue(), stats.getAs[Number](1).longValue(),
      stats.getAs[Number](2).longValue())
    val effectiveChunk = math.max(chunkSize, math.ceil(s.rowCount.toDouble / maxChunks).toLong)
    val preds = ChunkSplitter.predicates(keyColumn, ChunkSplitter.evenRanges(s, effectiveChunk))
    spark.read.jdbc(url, table, preds.toArray, props)
  }
}
