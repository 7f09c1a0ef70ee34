package graft.pipeline

import graft.model.{CdcSchema, SchemaChangeEvent, TableId}
import graft.operators.Changelog
import graft.ops.QuantileSketch
import graft.sinks.CdcSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The t-digest distribution monitor as a FIRST-CLASS pipeline asset (the
  * drift/PSI-table discipline): a `monitor:` YAML block declares per-cell
  * quantile sketch tables that every batch folds incrementally —
  * [[QuantileSketch.mergeSketchTables]] per micro-batch, the corpus never
  * re-scanned.
  *
  * ```yaml
  * monitor:
  *   - source-table: corpus.docs     # selector over routed SINK table ids
  *     dims: lang                    # optional cell dims (comma-separated)
  *     value: n_chars                # numeric column to sketch
  *     path: /warehouse/mon/docs     # persisted sketch-table location
  * ```
  *
  * Persistence is an epoch-dir + CURRENT-marker swap, single-writer (the
  * pipeline is the only maintainer of its own monitors — unlike the shared
  * [[graft.ops.IndexMaintenance]] indexes, no cross-job lease is needed;
  * concurrent per-table sink writes within one batch are serialized on a
  * JVM lock). Delivery is at-least-once BY DESIGN: a crash-replayed batch
  * folds its values twice. That is the right trade for an observability
  * asset — digests are rank-error-bounded estimates, never join keys
  * (the [[graft.functions.TDigest]] determinism stance), and making the
  * fold transactional with the data path would couple monitor I/O into
  * every sink's commit protocol.
  */
final case class MonitorDef(
    sourceTable: String,
    dims: Seq[String],
    value: String,
    path: String,
    compression: Int = 100) {
  lazy val selectors: graft.model.Selectors = graft.model.Selectors.parse(sourceTable)
}

object QuantileMonitor {

  private val foldLock = new Object

  /** The live sketch-table epoch dir under `path`, if any. */
  def currentEpoch(path: String): Option[String] = {
    val marker = java.nio.file.Paths.get(path, "CURRENT")
    if (java.nio.file.Files.exists(marker)) {
      val name = java.nio.file.Files.readString(marker).trim
      Some(s"$path/$name").filter(p =>
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p)))
    } else None
  }

  /** Read the live sketch table (empty-schema error if never folded). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentEpoch(path).getOrElse(
      throw new IllegalArgumentException(s"no sketch table at $path")))

  /** Fold one batch slice of sink table `id` into every matching monitor:
    * per-cell digests of the batch, merged into the current epoch, written
    * as the next epoch, marker swapped, previous epoch deleted. Rows are
    * the batch's post-images (DELETE rows carry no new value observation).
    */
  def fold(spark: SparkSession, id: TableId, batch: DataFrame,
           monitors: Seq[MonitorDef]): Unit =
    monitors.filter(_.selectors.matches(id)).foreach { m =>
      require((m.dims :+ m.value).forall(batch.columns.contains),
        s"monitor at ${m.path}: table $id lacks ${(m.dims :+ m.value).mkString(",")}")
      val sk = QuantileSketch.buildSketches(
        batch.select(m.dims.map(col) :+ col(m.value): _*), m.dims, m.value,
        m.compression)
      foldLock.synchronized {
        val (epochN, merged) = currentEpoch(m.path) match {
          case Some(cur) =>
            val n = cur.substring(cur.lastIndexOf('_') + 1).toLong
            (n + 1, QuantileSketch.mergeSketchTables(
              spark.read.parquet(cur), sk, m.dims, m.compression))
          case None => (0L, sk)
        }
        val next = s"epoch_$epochN"
        merged.write.mode("overwrite").parquet(s"${m.path}/$next")
        val marker = java.nio.file.Paths.get(m.path, "CURRENT")
        val tmp = java.nio.file.Paths.get(m.path, s"CURRENT.tmp$epochN")
        java.nio.file.Files.writeString(tmp, next)
        java.nio.file.Files.move(tmp, marker,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        if (epochN > 0) {
          val prev = java.nio.file.Paths.get(m.path, s"epoch_${epochN - 1}")
          org.apache.commons.io.FileUtils.deleteQuietly(prev.toFile)
          ()
        }
      }
    }

  /** Sink decorator for the streaming path: data write first (idempotent,
    * exactly-once via the sink's own protocol), then the at-least-once
    * monitor fold of the batch's non-DELETE rows.
    */
  final class MonitorSink(inner: CdcSink, spark: SparkSession,
                          monitors: Seq[MonitorDef]) extends CdcSink {
    override def applySchemaChange(e: SchemaChangeEvent): Unit =
      inner.applySchemaChange(e)
    override def write(id: TableId, changelog: DataFrame, schema: CdcSchema): Unit = {
      inner.write(id, changelog, schema)
      fold(spark, id, changelog.where(col(Changelog.OpCol) =!= "DELETE"), monitors)
    }
  }
}
