package graft.sinks

import graft.model.{CdcSchema, TableId}
import graft.operators.Changelog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Changelog → JSON wire formats for the Kafka sink.
  *
  * Mirrors the reference's Kafka pipeline connector serializers
  * (flink-cdc-pipeline-connector-kafka/.../json/debezium/
  * DebeziumJsonSerializationSchema.java and canal/CanalJsonSerializationSchema.java):
  * debezium-json = {before, after, op: c|u|d, source:{db, table}}, canal-json =
  * {old, data, type: INSERT|UPDATE|DELETE}. In Spark this is a pure projection
  * (`to_json(struct(...))`) feeding `writeStream.format("kafka")` — fully
  * codegen'd, no shuffle.
  */
object ChangelogJson {

  /** JSON options for the changelog wire WRITE side: microsecond timestamp
    * precision — the to_json default is milliseconds, which would silently
    * truncate every TIMESTAMP/TIMESTAMP_LTZ column crossing the Kafka path
    * (the reference's debezium-json carries epoch micros). Applied ONLY to
    * serialization: the from_json default parser is lenient (accepts
    * fraction-less values, space separators, and any fraction width —
    * probed on Spark 4.1.2), while an explicit read format would reject
    * external debezium/canal feeds whose timestamps omit the fraction.
    */
  val WireJsonOptions: Map[String, String] = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  private def payloadCols(df: DataFrame): Seq[Column] =
    df.columns.filterNot(c => c == Changelog.OpCol || c == Changelog.SeqCol)
      .map(col).toSeq

  /** Debezium `op` codes: c=create, u=update, d=delete, r=read/snapshot. */
  private def debeziumOp: Column =
    when(col(Changelog.OpCol) === "INSERT", "c")
      .when(col(Changelog.OpCol) === "UPDATE", "u")
      .when(col(Changelog.OpCol) === "REPLACE", "u")
      .otherwise("d")

  /** The debezium-json value of one changelog row, as a column over the
    * changelog frame (DELETE carries the before-image).
    */
  def debeziumValue(changelog: DataFrame, id: TableId): Column = {
    val payload = struct(payloadCols(changelog): _*)
    to_json(struct(
      when(col(Changelog.OpCol) === "DELETE", payload).otherwise(lit(null)).as("before"),
      when(col(Changelog.OpCol) =!= "DELETE", payload).otherwise(lit(null)).as("after"),
      debeziumOp.as("op"),
      col(Changelog.SeqCol).as("ts_ms"), // seq rides in ts_ms: round-trip keeps per-key order
      struct(lit(id.schemaName).as("db"), lit(id.tableName).as("table")).as("source")
    ), WireJsonOptions.asJava)
  }

  /** One string column `value` in debezium-json.
    *
    * The encode input is [[graft.ops.Spread.across]]-spread first: JSON
    * rendering is the most expensive per-row projection on the wire path,
    * and a compact batch input (e.g. a single-row-group snapshot file)
    * would otherwise serialize the whole encode inside one scan task.
    * No-op for streaming frames and for inputs already at the session's
    * parallelism (the 100 TB case); row SET is unchanged, row order is
    * not — every consumer keys on the in-band `ts_ms` seq, never on line
    * order (in-JVM A/B at sf0.1: roundtrip/pipeline queries 0.79-0.89x).
    *
    * LINE-ORDER CONTRACT (r20, advisor note): the emitted frame makes no
    * line-order or single-part-file promise — a file sink writes one part
    * per partition, and events with TIED `ts_ms` values interleave
    * arbitrarily across them. Per-key replay order is carried ONLY by the
    * in-band seq; a caller whose sequence column can tie (see the
    * DebeziumJson caveat: pass a Kafka offset) and who needs deterministic
    * lines must `coalesce(1).sortWithinPartitions(seq)` itself — at which
    * point the spread is moot anyway.
    */
  def debezium(changelog: DataFrame, id: TableId): DataFrame = {
    val c = graft.ops.Spread.across(changelog)
    c.select(debeziumValue(c, id).as("value"))
  }

  /** canal-json value column (`ts` carries the sequence like canal's ms clock). */
  def canalValue(changelog: DataFrame, id: TableId): Column = {
    val payload = struct(payloadCols(changelog): _*)
    to_json(struct(
      when(col(Changelog.OpCol) === "UPDATE", array(payload)).otherwise(lit(null)).as("old"),
      array(payload).as("data"),
      when(col(Changelog.OpCol) === "DELETE", "DELETE")
        .when(col(Changelog.OpCol) === "UPDATE", "UPDATE")
        .otherwise("INSERT").as("type"),
      col(Changelog.SeqCol).as("ts"),
      struct(lit(id.schemaName).as("db"), lit(id.tableName).as("table")).as("source")
    ), WireJsonOptions.asJava)
  }

  /** One string column `value` in canal-json (spread like [[debezium]]). */
  def canal(changelog: DataFrame, id: TableId): DataFrame = {
    val c = graft.ops.Spread.across(changelog)
    c.select(canalValue(c, id).as("value"))
  }
}

/** Kafka changelog sink — the `sink: {type: kafka}` seam of the reference's
  * Kafka pipeline connector (flink-cdc-pipeline-connector-kafka/.../
  * KafkaDataSink.java + ChangeLogJsonFormatFactory.java: `value.format` is
  * debezium-json or canal-json; records go to `topic`, defaulting to the
  * table identifier).
  *
  * Each batch serializes through [[ChangelogJson]] (pure codegen'd
  * projection) and lands via `df.write.format("kafka")`. The Spark↔Kafka
  * connector is a separate artifact, so the write path is CLASSPATH-GUARDED:
  * without `spark-sql-kafka-0-10` on board, construction-time config still
  * works (YAML parse, serialization) and `write` fails loudly — or a test /
  * embedded deployment injects `writer` to capture the wire frames.
  */
final class KafkaChangelogSink(
    bootstrapServers: String,
    topic: String = "",
    valueFormat: String = "debezium-json",
    writer: Option[DataFrame => Unit] = None) extends CdcSink {

  /** Dots are legal in Kafka topic names; the reference defaults the topic
    * to the table identifier verbatim, and so does this sink.
    */
  def topicFor(id: TableId): String =
    if (topic.nonEmpty) topic else id.identifier

  /** Changelog → (`key`, `value`) string columns in the configured wire
    * format. The KEY is the JSON of the primary-key columns: Kafka hashes it
    * to a partition, so all events of one PK land in one partition and the
    * per-key ordering the envelope's seq promises actually holds on a
    * multi-partition topic (the reference's upsert-kafka key contract).
    */
  def serialize(id: TableId, changelog: DataFrame, primaryKeys: Seq[String]): DataFrame = {
    val value = valueFormat match {
      case "debezium-json" => ChangelogJson.debeziumValue(changelog, id)
      case "canal-json" => ChangelogJson.canalValue(changelog, id)
      case other => throw new IllegalArgumentException(
        s"unknown value.format: $other (expected debezium-json or canal-json)")
    }
    val key =
      if (primaryKeys.isEmpty) lit(null).cast("string")
      else to_json(struct(primaryKeys.map(col): _*))
    changelog.select(key.as("key"), value.as("value"))
  }

  override def write(id: TableId, changelog: DataFrame, schema: CdcSchema): Unit = {
    val json = serialize(id, changelog, schema.primaryKeys)
    writer match {
      case Some(w) => w(json)
      case None =>
        require(KafkaChangelogSink.connectorAvailable,
          "Kafka sink configured but the spark-sql-kafka connector is not on the " +
            "classpath; add org.apache.spark:spark-sql-kafka-0-10 to the deployment")
        json.write.format("kafka")
          .option("kafka.bootstrap.servers", bootstrapServers)
          .option("topic", topicFor(id))
          .save()
    }
  }
}

object KafkaChangelogSink {
  /** The Kafka DataSource ships separately from Spark core. */
  lazy val connectorAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }
}
