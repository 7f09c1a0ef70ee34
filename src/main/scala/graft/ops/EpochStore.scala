package graft.ops

import org.apache.spark.sql.SparkSession

/** The single-writer EPOCH-ASSET protocol shared by the pipeline's small
  * persisted state tables (the `monitor:` quantile sketches in
  * [[graft.pipeline.QuantileMonitor]], the PCA sufficient statistics in
  * [[Pca]]): numbered `epoch_N` dirs resolved by LISTING through the
  * Hadoop FileSystem API (hdfs://, s3a://, local all behave the same) —
  * the live epoch is the highest dir carrying the parquet job-commit
  * `_SUCCESS`, so a crash mid-write leaves an uncommitted dir the next
  * writer simply overwrites; no marker file, no non-atomic rename window.
  * Writers keep ONE grace epoch (every dir below N−1 reclaimed, committed
  * or crash-leftover — gapped sequences never leak) so a reader that
  * resolved the previous epoch right before a write still scans its
  * files — the bounded-staleness trade of a single-writer asset.
  *
  * Unlike the multi-writer [[IndexMaintenance]] lease/marker/swap
  * protocol (built for the large persisted index families whose appends
  * and compactions race across jobs), this one assumes the pipeline is
  * the only maintainer of its own assets: concurrency within one driver
  * serializes on a PER-PATH lock, keyed on the filesystem-QUALIFIED,
  * URI-normalized path so two configs spelling one directory differently
  * (trailing slash, dot segments, relative vs absolute, bare vs
  * scheme-qualified) share a lock instead of racing their epoch writes.
  */
object EpochStore {

  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** The per-asset write lock for `path` (see class doc for the keying). */
  def lockFor(spark: SparkSession, path: String): Object = {
    // URI-normalize after qualification (Hadoop Path strips trailing
    // slashes but keeps `.` segments), then rebuild scheme://authority/path
    // by hand: makeQualified returns an ALREADY scheme-qualified input
    // as-is with a null authority while a freshly qualified bare path
    // carries the filesystem's empty authority — `file:/x` vs `file:///x`
    // — and the two spellings must not split the lock
    val u = fs(spark, path)
      .makeQualified(new org.apache.hadoop.fs.Path(path))
      .toUri.normalize()
    val key = s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
    locks.getOrElseUpdate(key, new Object)
  }

  private val EpochName = "epoch_(\\d+)".r

  def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    IndexMaintenance.fsOf(path, spark)

  /** One listing of `path`: every `epoch_N` dir as (N, status), ascending.
    * A write shares this listing between live-epoch resolution and the GC
    * sweep — on an object store LIST is a slow, billed RPC paid per asset
    * per batch, so it is issued once, not twice.
    */
  def epochStatuses(f: org.apache.hadoop.fs.FileSystem, path: String):
      Seq[(Long, org.apache.hadoop.fs.FileStatus)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case EpochName(n) => Some((n.toLong, st))
          case _ => None
        }
    }.flatten.sortBy(_._1)
  }

  /** COMMITTED epoch numbers among `statuses`: dirs whose parquet job
    * finished (the `_SUCCESS` commit file) — a crash mid-write is invisible.
    */
  def committedOf(f: org.apache.hadoop.fs.FileSystem,
                  statuses: Seq[(Long, org.apache.hadoop.fs.FileStatus)]): Seq[Long] =
    statuses.collect {
      case (n, st)
        if f.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")) => n
    }

  def committedEpochs(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    committedOf(f, epochStatuses(f, path))
  }

  /** The live asset epoch dir under `path`, if any. */
  def currentEpoch(spark: SparkSession, path: String): Option[String] =
    committedEpochs(spark, path).lastOption.map(n => s"$path/epoch_$n")

  /** Reclaim EVERY epoch dir below the grace epoch `newEpoch - 1`,
    * committed or crash-leftover — a gapped sequence must not leak dirs
    * forever. `statuses` is the pre-write listing (the caller holds the
    * lock, so it is race-free; the epoch just written is above the grace
    * bar by construction and absent from the listing).
    */
  def gcBelowGrace(f: org.apache.hadoop.fs.FileSystem,
                   statuses: Seq[(Long, org.apache.hadoop.fs.FileStatus)],
                   newEpoch: Long): Unit =
    statuses.foreach { case (n, st) =>
      if (n < newEpoch - 1) { f.delete(st.getPath, true); () }
    }
}
