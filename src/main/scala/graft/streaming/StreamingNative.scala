package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Drive a STREAMING-native operator (session_window,
  * dropDuplicatesWithinWatermark, flatMapGroupsWithState, ...) over a real
  * `readStream` file source so its output can be oracle-compared like any
  * batch query — the streaming ENGINE itself under the correctness gate,
  * not its batch twin.
  *
  * Mechanics: the transformed stream appends to a parquet file sink
  * (exactly-once via the sink's `_spark_metadata` commit log + the
  * checkpoint). Append-mode stateful operators only EMIT results the
  * watermark has sealed, and the watermark only advances at batch
  * boundaries — so after the backlog run, `betweenRuns` callbacks drop
  * far-future SENTINEL files and re-run: sentinel 1's batch advances the
  * watermark past every real event; sentinel 2's batch then executes under
  * that watermark and flushes every sealed result. Callers filter the
  * sentinel keys out of the returned frame. (Two sentinels, not a reliance
  * on no-data micro-batches, keep the flush deterministic across Spark's
  * `noDataMicroBatches` behavior.)
  */
object StreamingNative {

  /** Probe knobs, set ONLY by [[graft.ScaleProbe]]'s streaming section and
    * always reset after: `probeMaxFilesPerTrigger` bounds micro-batches so
    * the backlog is consumed in several watermark-advancing batches (state
    * eviction actually exercised, the deployment shape) instead of one;
    * `probeStateRows` collects each progress event's total state-store
    * (rows, memory bytes) so per-batch state growth can be compared across
    * scale factors — bytes matter because a per-key VALUE that accumulates
    * per event (an open-session list that never closes) balloons the store
    * while the row count, one row per key, stays flat.
    * Both default off — production call sites never see them.
    */
  @volatile private[graft] var probeMaxFilesPerTrigger: Option[Int] = None
  @volatile private[graft] var probeStateRows:
    Option[scala.collection.mutable.Buffer[(Long, Long)]] = None

  /** Run `build(stream)` to quiescence: one AvailableNow run per element of
    * `betweenRuns` (invoked in order between runs) plus the initial backlog
    * run. Returns the committed sink contents as a batch frame.
    */
  def fileStreamRuns(spark: SparkSession, inDir: String, schema: StructType,
                     outDir: String, checkpointDir: String,
                     betweenRuns: Seq[() => Unit])(
                     build: DataFrame => DataFrame): DataFrame = {
    def once(): Unit = {
      // state capture via a listener, not q.recentProgress: the progress
      // ring buffer keeps only `numRecentProgressUpdates` (default 100)
      // events, so a bounded-trigger probe over a large backlog would drop
      // early batches and under-report a mid-run state peak. The listener
      // sees EVERY progress event; the bus is drained before returning so
      // a finished query's trailing events are counted.
      // a unique query name scopes the session-global listener to THIS
      // query — a concurrent stream on the shared session must not leak
      // its state rows into the probe buffer
      val probeName = probeStateRows.map(_ =>
        "graft_probe_" + java.util.UUID.randomUUID().toString.replace("-", ""))
      val listener = probeStateRows.map { buf =>
        val l = new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
            if (probeName.contains(e.progress.name) && e.progress.stateOperators.nonEmpty)
              buf.synchronized {
                buf += ((e.progress.stateOperators.map(_.numRowsTotal).sum,
                  e.progress.stateOperators.map(_.memoryUsedBytes).sum)); ()
              }
          override def onQueryTerminated(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        }
        spark.streams.addListener(l); l
      }
      try {
        val reader = spark.readStream.schema(schema)
        val bounded = probeMaxFilesPerTrigger
          .fold(reader)(m => reader.option("maxFilesPerTrigger", m.toString))
        val writer0 = build(bounded.parquet(inDir))
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", checkpointDir)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
        val q = probeName.fold(writer0)(writer0.queryName).start()
        q.awaitTermination()
      } finally listener.foreach { l =>
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        spark.streams.removeListener(l)
      }
    }
    once()
    betweenRuns.foreach { cb => cb(); once() }
    spark.read.parquet(outDir)
  }
}
