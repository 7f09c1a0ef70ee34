package graft.sources

import graft.operators.Changelog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/** canal-json changelog feed → graft changelog envelope — the consume side
  * of the reference Kafka sink's second wire format
  * (flink-cdc-pipeline-connector-kafka/.../json/canal/
  * CanalJsonSerializationSchema.java): `{old, data: [...], type:
  * INSERT|UPDATE|DELETE, ts, source:{db, table}}`.
  *
  * Like [[DebeziumJson]]: pure projections + one `explode` (canal batches
  * multiple rows per message in `data`), all inside codegen, no shuffle.
  */
object CanalJson {

  private def envelopeSchema(payload: StructType): StructType =
    StructType(Seq(
      StructField("old", ArrayType(payload)),
      StructField("data", ArrayType(payload)),
      StructField("type", StringType),
      StructField("ts", LongType),
      StructField("source", StructType(Seq(
        StructField("db", StringType),
        StructField("table", StringType))))))

  /** Parse a `value: STRING` canal-json frame for one table's payload
    * schema into payload columns + `__op`/`__seq` (+ `__db`/`__table`).
    * DELETE rows carry the deleted image (canal puts it in `data`).
    */
  def parse(df: DataFrame, payload: StructType, valueCol: String = "value",
            seq: Option[Column] = None): DataFrame = {
    val parsed = df.withColumn("__cnl", from_json(col(valueCol), envelopeSchema(payload)))
    val op =
      when(col("__cnl.type") === "DELETE", "DELETE")
        .when(col("__cnl.type") === "UPDATE", "UPDATE")
        .otherwise("INSERT")
    parsed
      .select(explode(col("__cnl.data")).as("__img"),
        op.as(Changelog.OpCol),
        seq.getOrElse(col("__cnl.ts")).as(Changelog.SeqCol),
        col("__cnl.source.db").as("__db"),
        col("__cnl.source.table").as("__table"))
      .select(
        payload.fieldNames.map(f => col(s"__img.$f").as(f)).toSeq ++ Seq(
          col(Changelog.OpCol), col(Changelog.SeqCol), col("__db"), col("__table")): _*)
  }
}
