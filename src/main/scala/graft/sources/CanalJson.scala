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
    *
    * With `primaryKeys`, an UPDATE whose `old` image keys differently from
    * its `data` image (PK-mutating update) splits into DELETE(old) +
    * UPDATE(data), like [[DebeziumJson.parse]] — otherwise the old key's
    * row would stay in downstream upsert state forever.
    */
  def parse(df: DataFrame, payload: StructType, valueCol: String = "value",
            seq: Option[Column] = None, primaryKeys: Seq[String] = Nil): DataFrame = {
    val parsed = df.withColumn("__cnl", from_json(col(valueCol), envelopeSchema(payload)))
    val op =
      when(col("__cnl.type") === "DELETE", "DELETE")
        .when(col("__cnl.type") === "UPDATE", "UPDATE")
        .otherwise("INSERT")
    // canal batches rows: data[i] pairs with old[i]
    val pairs = arrays_zip(
      col("__cnl.data").as("img"),
      coalesce(col("__cnl.old"),
        array_repeat(lit(null).cast(payload), size(col("__cnl.data")))).as("old"))
    val imgOp =
      if (primaryKeys.isEmpty)
        parsed.select(explode(pairs).as("__p"), col("__cnl"))
          .select(array(struct(col("__p.img").as("img"), op.as("opw"))).as("__e"), col("__cnl"))
      else {
        val pkChanged = primaryKeys
          .map(k => !(col("__p.old").getField(k) <=> col("__p.img").getField(k)))
          .reduce(_ || _)
        parsed.select(explode(pairs).as("__p"), col("__cnl"))
          .select(
            when(col("__cnl.type") === "UPDATE" && col("__p.old").isNotNull && pkChanged,
              array(struct(col("__p.old").as("img"), lit("DELETE").as("opw")),
                    struct(col("__p.img").as("img"), lit("UPDATE").as("opw"))))
              .otherwise(array(struct(col("__p.img").as("img"), op.as("opw")))).as("__e"),
            col("__cnl"))
      }
    imgOp
      .select(explode(col("__e")).as("__x"),
        seq.getOrElse(col("__cnl.ts")).as(Changelog.SeqCol),
        col("__cnl.source.db").as("__db"),
        col("__cnl.source.table").as("__table"))
      .select(
        payload.fieldNames.map(f => col(s"__x.img.$f").as(f)).toSeq ++ Seq(
          col("__x.opw").as(Changelog.OpCol),
          col(Changelog.SeqCol), col("__db"), col("__table")): _*)
  }
}
