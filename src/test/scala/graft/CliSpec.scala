package graft

import graft.model._
import graft.operators.{SchemaRegistry, TransformRule}
import graft.sinks.{ValuesDatabase, ValuesSink}
import graft.streaming.StreamingPipeline

class CliSpec extends SparkSpec {

  test("batch YAML pipeline via Cli writes parquet sink tables") {
    val out = java.nio.file.Files.createTempDirectory("graft-cli").toString
    val yaml = java.nio.file.Files.createTempFile("pipe", ".yaml")
    java.nio.file.Files.writeString(yaml,
      s"""source:
         |  type: parquet
         |  path: $sf
         |  tables: tpch.nation
         |transform:
         |  - source-table: tpch.nation
         |    projection: "n_nationkey, UPPER(n_name) AS n_name"
         |route:
         |  - source-table: tpch.nation
         |    sink-table: out.nations
         |sink:
         |  type: parquet
         |  path: $out
         |pipeline:
         |  name: cli-smoke
         |""".stripMargin)
    Cli.main(Array(yaml.toString))
    val written = spark.read.parquet(s"$out/out.nations".replace("out.nations", "out_nations"))
    assert(written.count() === 25)
    assert(written.columns.toSeq === Seq("n_nationkey", "n_name"))
  }

  test("driver-contract entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SOFT_DELETE converter keeps tombstones as flagged rows through the pipeline") {
    import spark.implicits._
    val registry = new SchemaRegistry()
    val db = new ValuesDatabase
    val id = TableId.of("db", "users")
    val pipe = new StreamingPipeline(registry,
      transforms = Seq(TransformRule("db.users", postTransformConverter = Some("SOFT_DELETE"))),
      sink = new ValuesSink(db))
    pipe.applySchemaChange(CreateTableEvent(id,
      CdcSchema.of("id" -> "BIGINT", "name" -> "STRING").copy(primaryKeys = Seq("id"))))

    val batch = Seq(
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c","ts_ms":1,"source":{"db":"db","table":"users"}}""",
      """{"before":{"id":1,"name":"a"},"after":null,"op":"d","ts_ms":2,"source":{"db":"db","table":"users"}}"""
    ).toDF("value")
    pipe.processBatch(batch, 0L)

    assert(db.schemaOf(id).get.columnNames === Seq("id", "name", "__deleted"))
    assert(db.results(id).map(_.toList) === Seq(List(1L, "a", true)))
  }
}
