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
  * Persistence: numbered epoch dirs resolved by LISTING through the Hadoop
  * FileSystem API (hdfs://, s3a://, local all behave the same) — the live
  * epoch is the highest `epoch_N` carrying the parquet job-commit
  * `_SUCCESS`, so a crash mid-write leaves an uncommitted dir the next
  * fold simply overwrites; no marker file, no non-atomic rename window.
  * Each fold keeps ONE grace epoch (deletes N−2, not N−1) so a reader that
  * resolved the previous epoch right before a fold still scans it — the
  * bounded-staleness trade of a single-writer asset (the pipeline is the
  * only maintainer of its own monitors; unlike the shared
  * [[graft.ops.IndexMaintenance]] indexes no cross-job lease is needed,
  * and concurrent per-table sink writes within one batch are serialized
  * on a JVM lock). Delivery is at-least-once BY DESIGN: a crash-replayed
  * batch folds its values twice. That is the right trade for an
  * observability asset — digests are rank-error-bounded estimates, never
  * join keys (the [[graft.functions.TDigest]] determinism stance), and
  * making the fold transactional with the data path would couple monitor
  * I/O into every sink's commit protocol.
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
  private val EpochName = "epoch_(\\d+)".r

  private def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    graft.ops.IndexMaintenance.fsOf(path, spark)

  /** COMMITTED epoch numbers under `path`: `epoch_N` dirs whose parquet job
    * finished (the `_SUCCESS` commit file) — a crash mid-write is invisible.
    */
  private def committedEpochs(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case EpochName(n)
            if f.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")) =>
            Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted
  }

  /** The live sketch-table epoch dir under `path`, if any. */
  def currentEpoch(spark: SparkSession, path: String): Option[String] =
    committedEpochs(spark, path).lastOption.map(n => s"$path/epoch_$n")

  /** Read the live sketch table (loud error if never folded). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentEpoch(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no sketch table at $path")))

  /** Fold one batch slice of sink table `id` into every matching monitor:
    * per-cell digests of the batch, merged with the live epoch, committed
    * as the next epoch; epoch N−2 is deleted (N−1 stays as the reader
    * grace epoch). Rows are the batch's post-images (DELETE rows carry no
    * new value observation).
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
        val (epochN, merged) = currentEpoch(spark, m.path) match {
          case Some(cur) =>
            val n = cur.substring(cur.lastIndexOf('_') + 1).toLong
            (n + 1, QuantileSketch.mergeSketchTables(
              spark.read.parquet(cur), sk, m.dims, m.compression))
          case None => (0L, sk)
        }
        merged.write.mode("overwrite").parquet(s"${m.path}/epoch_$epochN")
        if (epochN > 1) {
          fs(spark, m.path).delete(
            new org.apache.hadoop.fs.Path(s"${m.path}/epoch_${epochN - 2}"), true)
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
