package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source startup modes — where a CDC pipeline begins reading the change
  * stream (reference `MySqlDataSourceOptions.scan.startup.mode`:
  * initial / earliest-offset / latest-offset / timestamp / specific-offset;
  * base framework `StartupOptions`).
  *
  * On a consumed debezium feed the binlog position maps to the envelope's
  * `ts_ms` (or a Kafka offset when provided as the sequence), so each mode
  * is a cheap per-record lower-bound filter on the RAW feed — a narrow
  * `get_json_object` projection that runs before any payload parsing and
  * prunes skipped records at ingest, never buffering them.
  */
object StartupOptions {

  sealed trait Mode
  /** Snapshot first, then stream (the default; the snapshot phase itself is
    * [[graft.streaming.StreamingPipeline.snapshotLoad]]). */
  case object Initial extends Mode
  /** No snapshot; replay the change stream from its beginning. */
  case object Earliest extends Mode
  /** No snapshot; only changes after the stream position at launch. */
  case object Latest extends Mode
  /** Changes with `ts_ms >= tsMs`. */
  final case class Timestamp(tsMs: Long) extends Mode
  /** Changes strictly after the given offset/sequence. */
  final case class SpecificOffset(offset: Long) extends Mode

  /** Parse the reference's YAML option surface:
    * `scan.startup.mode` + `scan.startup.timestamp-ms` / `scan.startup.specific-offset`.
    */
  def parse(options: Map[String, String]): Mode =
    options.getOrElse("scan.startup.mode", "initial") match {
      case "initial"                      => Initial
      case "earliest-offset" | "earliest" => Earliest
      case "latest-offset" | "latest"     => Latest
      case "timestamp" =>
        Timestamp(options.getOrElse("scan.startup.timestamp-ms",
          throw new IllegalArgumentException("timestamp mode needs scan.startup.timestamp-ms")).toLong)
      case "specific-offset" =>
        SpecificOffset(options.getOrElse("scan.startup.specific-offset",
          throw new IllegalArgumentException("specific-offset mode needs scan.startup.specific-offset")).toLong)
      case other => throw new IllegalArgumentException(s"unknown scan.startup.mode: $other")
    }

  /** Apply a startup mode to a raw debezium-json feed (`value: STRING`).
    *
    * @param launchPosition the stream's max `ts_ms` at launch, used only by
    *                       [[Latest]] (computed once, by-name — e.g. a batch
    *                       read over the backlog before the stream starts)
    */
  def apply(feed: DataFrame, mode: Mode, launchPosition: => Long,
            valueCol: String = "value"): DataFrame = {
    // fused top-level-field extract + cast: ONE byte scan of the record per
    // row instead of get_json_object's full Jackson parse (r20; guide §4 —
    // parity contract on CdcExprHelpers.jsonLongField: the envelope's ts_ms
    // is always a plain top-level integer)
    lazy val ts = graft.functions.CdcExpressions.jsonLongField(col(valueCol), "ts_ms")
    // records WITHOUT a ts_ms (in-band schema-change control records,
    // malformed lines) pass through: the position filter only skips
    // positioned data records — control DDL must never be lost to a
    // startup offset, and malformed lines belong to the dead-letter path.
    // `coalesce(ts ⋈ bound, true)` is exactly `ts IS NULL OR ts ⋈ bound`
    // (the compare is null iff ts is null) but evaluates the
    // get_json_object scan of the record ONCE per row instead of twice
    // (r19; guide §4's evaluate-expensive-expressions-once stance)
    def pass(cmp: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      coalesce(cmp, lit(true))
    mode match {
      case Initial | Earliest => feed
      case Latest             => val b = launchPosition; feed.where(pass(ts > b))
      case Timestamp(t)       => feed.where(pass(ts >= t))
      case SpecificOffset(o)  => feed.where(pass(ts > o))
    }
  }

  /** Max `ts_ms` currently present in a file-backed feed (0 when empty) —
    * the launch position for [[Latest]] over a replayed directory.
    */
  def filePosition(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
    if (!files.exists(_.isFile)) return 0L
    spark.read.text(path)
      .select(max(graft.functions.CdcExpressions.jsonLongField(col("value"), "ts_ms")))
      .head() match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0)
    }
  }
}
