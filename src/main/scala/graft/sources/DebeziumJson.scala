package graft.sources

import graft.operators.Changelog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Debezium-JSON changelog feed → graft changelog envelope.
  *
  * The consume side of the reference's Kafka wire format
  * (flink-cdc-pipeline-connector-kafka/.../json/debezium/
  * DebeziumJsonSerializationSchema.java): `{before, after, op: c|r|u|d,
  * source: {db, table}, ts_ms}`. This is how Spark ingests the change feeds
  * the reference's sources produce (SURVEY.md §2.1: Debezium→Kafka→
  * readStream + from_json) — the engine never re-implements a binlog client.
  *
  * Works identically on batch and streaming frames: every step is a pure
  * projection (`from_json` + column ops), so it stays inside WholeStageCodegen
  * and imposes no shuffle — at 100 TB of changelog this is scan-bound.
  */
object DebeziumJson {

  /** Envelope fields around the payload. */
  private def envelopeSchema(payload: StructType): StructType =
    StructType(Seq(
      org.apache.spark.sql.types.StructField("before", payload),
      org.apache.spark.sql.types.StructField("after", payload),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", StructType(Seq(
        org.apache.spark.sql.types.StructField("db", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("table", org.apache.spark.sql.types.StringType))))))

  private val opWord: Column =
    when(col("__dbz.op") === "c" || col("__dbz.op") === "r", "INSERT")
      .when(col("__dbz.op") === "u", "UPDATE")
      .when(col("__dbz.op") === "d", "DELETE")
      .otherwise("REPLACE")

  /** Parse a frame with a `value: STRING` column of debezium-json into the
    * changelog envelope for ONE table's payload schema: payload columns +
    * `__op` + `__seq` (+ `__db`, `__table` source identifiers).
    *
    * DELETE rows carry the before-image as payload (the PK is what the sink
    * needs); everything else carries the after-image.
    *
    * When `primaryKeys` is given, an UPDATE whose before-image key differs
    * from its after-image key (PK-mutating update) is split into TWO
    * envelope rows — DELETE(before) + UPDATE(after) — so the old key's row
    * is removed from downstream upsert state. The reference carries both
    * images per event and its sinks handle this case
    * (DsqlBatchSinkFunction's update path keys on the before-image);
    * without `primaryKeys` the after-image-only behavior applies and a
    * PK-mutating update leaves the old key behind.
    *
    * With `emitUpdateBefore`, an IN-PLACE update (before-image present,
    * key unchanged) emits a `UPDATE_BEFORE` retraction row carrying the
    * before-image ahead of its after-image row — the Flink `-U`/`+U` row
    * pair, consumed by retraction-folding decorators
    * ([[graft.operators.Changelog.UpdateBeforeOp]] documents why it must
    * be stripped before any sink materialization). An update without a
    * before-image (a source configured without `REPLICA IDENTITY FULL`)
    * still emits only its after-image — and so does EVERY update when
    * `primaryKeys` is empty: without keys, in-place vs key-changing is
    * undecidable, and a misclassified key-changing update would retract a
    * row the sink still materializes (the pair rides the PK proof).
    *
    * @param seq column providing the per-key monotone sequence; defaults to
    *            `ts_ms` — pass a Kafka offset when ts_ms ties are possible.
    */
  def parse(df: DataFrame, payload: StructType, valueCol: String = "value",
            seq: Option[Column] = None, primaryKeys: Seq[String] = Nil,
            emitUpdateBefore: Boolean = false): DataFrame = {
    val parsed = df.withColumn("__dbz", from_json(col(valueCol), envelopeSchema(payload)))
    val image = when(col("__dbz.op") === "d", col("__dbz.before")).otherwise(col("__dbz.after"))
    val single = array(struct(image.as("img"), opWord.as("opw")))
    // null-safe inequality on any PK column marks a key-changing update
    val pkChanged: Option[Column] =
      if (primaryKeys.isEmpty) None
      else Some(primaryKeys
        .map(k => !(col("__dbz.before").getField(k) <=> col("__dbz.after").getField(k)))
        .reduce(_ || _))
    val withPkSplit = pkChanged.fold(single)(changed =>
      when(col("__dbz.op") === "u" && col("__dbz.before").isNotNull && changed,
        array(struct(col("__dbz.before").as("img"), lit("DELETE").as("opw")),
              struct(col("__dbz.after").as("img"), lit("UPDATE").as("opw"))))
        .otherwise(single))
    val imgOp =
      if (!emitUpdateBefore) withPkSplit
      else {
        // pair emission needs the PKs to PROVE the update is in-place: a
        // key-changing update's retraction must ride its DELETE leg (the
        // sink supersedes the old key through it), not an UPDATE_BEFORE
        // that the sink strips while still holding the old row. Without
        // declared PKs in-place vs key-changing is undecidable, so fall
        // back to after-image-only — a histogram that under-retracts
        // (grow-only drift, the documented pre-retract behavior) beats one
        // that negates rows the sink still materializes.
        val inPlace = col("__dbz.op") === "u" && col("__dbz.before").isNotNull &&
          pkChanged.fold(lit(false))(c => !c)
        when(inPlace,
          array(struct(col("__dbz.before").as("img"),
                  lit(graft.operators.Changelog.UpdateBeforeOp).as("opw")),
                struct(col("__dbz.after").as("img"), lit("UPDATE").as("opw"))))
          .otherwise(withPkSplit)
      }
    parsed
      .select(explode(imgOp).as("__e"),
        seq.getOrElse(col("__dbz.ts_ms")).as(Changelog.SeqCol),
        col("__dbz.source.db").as("__db"),
        col("__dbz.source.table").as("__table"))
      .select(
        payload.fieldNames.map(f => col(s"__e.img.$f").as(f)).toSeq ++ Seq(
          col("__e.opw").as(Changelog.OpCol),
          col(Changelog.SeqCol), col("__db"), col("__table")): _*)
  }

  /** Table id of each raw record without payload parsing — used to fan a
    * multi-table feed out to per-table parsing (cheap: only source.* parsed).
    */
  def tableOf(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.withColumn("__dbz", from_json(col(valueCol), envelopeSchema(StructType(Nil))))
      .withColumn("__db", col("__dbz.source.db"))
      .withColumn("__table", col("__dbz.source.table"))
      .drop("__dbz")
}
