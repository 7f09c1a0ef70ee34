package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka streaming source seam — `source: {type: kafka}` in the pipeline
  * YAML becomes `readStream.format("kafka")` feeding the same debezium-json
  * micro-batch pipeline the file feed drives.
  *
  * This is the primary ingestion path replacing the reference's MySQL/
  * Postgres pipeline sources (pc/flink-cdc-pipeline-connector-mysql/.../
  * MySqlDataSourceOptions.java:32-328): Debezium publishes each table's
  * changelog to Kafka, Spark consumes it (SURVEY.md §2.1). The option
  * surface mirrors the reference's source block where a Kafka consumer has
  * an equivalent — `properties.bootstrap.servers`, `topic`/`topic-pattern`,
  * `scan.startup.mode` — and the sink seam's conventions
  * ([[graft.sinks.KafkaChangelogSink]]).
  *
  * Scale shape: startup modes push down to a BROKER-side seek
  * (`startingOffsets`/`startingTimestamp`), unlike the file feed's
  * per-record lower-bound filter — on a deep backlog the consumer never
  * fetches the skipped range at all. Downstream parallelism follows topic
  * partitions; the PK message key the sink writes keeps per-key order
  * within a partition, which the pipeline's per-PK `max_by` merge relies on.
  */
object KafkaSource {

  /** Resolve the pipeline source block into Spark Kafka reader options.
    * Unknown `properties.*` entries pass through as `kafka.*` client
    * configs (the reference forwards client properties the same way).
    */
  def kafkaOptions(options: Map[String, String]): Map[String, String] = {
    val servers = options.getOrElse("properties.bootstrap.servers",
      throw new IllegalArgumentException("kafka source needs `properties.bootstrap.servers`"))
    val subscription = (options.get("topic"), options.get("topic-pattern")) match {
      case (Some(t), None) => "subscribe" -> t
      case (None, Some(p)) => "subscribePattern" -> p
      case (Some(_), Some(_)) =>
        throw new IllegalArgumentException("kafka source: `topic` and `topic-pattern` are exclusive")
      case (None, None) =>
        throw new IllegalArgumentException("kafka source needs `topic` or `topic-pattern`")
    }
    val startup: Map[String, String] =
      options.getOrElse("scan.startup.mode", "earliest-offset") match {
        // `initial` ≡ `earliest-offset` here: a log-compacted CDC topic's
        // retained history IS the snapshot (≥1 record per live key), so the
        // hybrid snapshot→stream distinction collapses into one replay
        case "initial" | "earliest-offset" | "earliest" => Map("startingOffsets" -> "earliest")
        case "latest-offset" | "latest" => Map("startingOffsets" -> "latest")
        case "timestamp" => Map("startingTimestamp" ->
          options.getOrElse("scan.startup.timestamp-ms",
            throw new IllegalArgumentException("timestamp mode needs scan.startup.timestamp-ms")))
        case "specific-offset" => Map("startingOffsets" ->
          options.getOrElse("scan.startup.specific-offsets",
            throw new IllegalArgumentException(
              "specific-offset mode needs scan.startup.specific-offsets " +
                """(per-partition JSON, e.g. {"topic":{"0":42}})""")))
        case other => throw new IllegalArgumentException(s"unknown scan.startup.mode: $other")
      }
    val passthrough = options.collect {
      case (k, v) if k.startsWith("properties.") && k != "properties.bootstrap.servers" =>
        s"kafka.${k.stripPrefix("properties.")}" -> v
    }
    Map("kafka.bootstrap.servers" -> servers) + subscription ++ startup ++ passthrough
  }

  /** The raw changelog feed as a streaming frame of `value: STRING`
    * debezium-json envelopes — the exact shape
    * [[graft.streaming.StreamingPipeline.processBatch]] consumes.
    *
    * `reader` substitutes the broker for tests / embedded runs (the
    * spark-sql-kafka connector jar ships separately — same classpath-guard +
    * injection design as the sink seam, ChangelogJson.scala:126-139): it
    * receives the RESOLVED reader options so specs can assert the mapping
    * while supplying any streaming frame as the stand-in feed.
    */
  def frame(spark: SparkSession, options: Map[String, String],
            reader: Option[(SparkSession, Map[String, String]) => DataFrame] = None): DataFrame = {
    val opts = kafkaOptions(options)
    reader match {
      case Some(r) => r(spark, opts)
      case None =>
        require(graft.sinks.KafkaChangelogSink.connectorAvailable,
          "Kafka source configured but the spark-sql-kafka connector is not on the " +
            "classpath; add org.apache.spark:spark-sql-kafka-0-10 to the deployment")
        opts.foldLeft(spark.readStream.format("kafka"))((b, kv) => b.option(kv._1, kv._2))
          .load()
          .selectExpr("CAST(value AS STRING) AS value")
    }
  }
}
