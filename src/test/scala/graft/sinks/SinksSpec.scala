package graft.sinks

import graft.SparkSpec
import graft.model.{CdcSchema, TableId}
import graft.operators.Changelog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class UpsertSqlSpec extends SparkSpec {
  private val t = TableId.of("public", "users")
  private val schema = CdcSchema.of("id" -> "BIGINT", "name" -> "STRING", "bal" -> "DOUBLE")
    .copy(primaryKeys = Seq("id"))

  test("create table includes pk constraint and mapped types") {
    assert(UpsertSql.createTable(t, schema) ===
      """CREATE TABLE IF NOT EXISTS "public"."users" ("id" BIGINT, "name" TEXT, "bal" DOUBLE PRECISION, PRIMARY KEY ("id"))""")
  }

  test("insert-on-conflict updates non-pk columns only") {
    val sql = UpsertSql.insertOnConflict(t, schema)
    assert(sql.contains("""ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name", "bal" = EXCLUDED."bal""""))
    assert(sql.contains("VALUES (?, ?, ?)"))
  }

  test("copy / update / delete statements") {
    assert(UpsertSql.copy(t, schema) ===
      """COPY "public"."users" ("id", "name", "bal") FROM STDIN (FORMAT CSV)""")
    assert(UpsertSql.delete(t, schema) === """DELETE FROM "public"."users" WHERE "id" = ?""")
    assert(UpsertSql.update(t, schema) ===
      """UPDATE "public"."users" SET "name" = ?, "bal" = ? WHERE "id" = ?""")
  }

  test("COPY csv encoding: nulls empty, quotes doubled, separators quoted, bytea hex") {
    assert(UpsertSql.csvLine(Seq(1L, null, "plain")) === "1,,plain")
    assert(UpsertSql.csvLine(Seq("a,b", "say \"hi\"", "line\nbreak")) ===
      "\"a,b\",\"say \"\"hi\"\"\",\"line\nbreak\"")
    assert(UpsertSql.csvLine(Seq(Array[Byte](0x0a, 0x7f))) === "\\x0a7f")
  }

  test("unknown types map to TEXT like DsqlSchemaMapper") {
    assert(UpsertSql.pgType(ArrayType(IntegerType)) === "TEXT")
    assert(UpsertSql.pgType(DecimalType(20, 4)) === "NUMERIC(20,4)")
  }
}

class ChangelogJsonSpec extends SparkSpec {

  test("debezium-json carries after-image for upserts, before-image for deletes") {
    import spark.implicits._
    val ch = Seq(
      (1L, "a", "INSERT", 1L),
      (2L, "b", "DELETE", 2L)).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    val out = ChangelogJson.debezium(ch, TableId.of("db", "t"))
      .as[String].collect().sorted
    assert(out(0).contains(""""after":{"id":1,"v":"a"}""") && out(0).contains(""""op":"c""""))
    assert(out(1).contains(""""before":{"id":2,"v":"b"}""") && out(1).contains(""""op":"d""""))
    assert(out.forall(_.contains(""""source":{"db":"db","table":"t"}""")))
  }

  test("canal-json uses INSERT/UPDATE/DELETE type words") {
    import spark.implicits._
    val ch = Seq((1L, "a", "UPDATE", 1L)).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    val out = ChangelogJson.canal(ch, TableId.of("db", "t")).as[String].head()
    assert(out.contains(""""type":"UPDATE"""") && out.contains(""""old":[{"id":1,"v":"a"}]"""))
    assert(out.contains(""""ts":1"""))
  }

  test("canal PK-mutating update splits into DELETE(old) + UPDATE(data)") {
    import spark.implicits._
    val schema = graft.model.CdcSchema.of("id" -> "BIGINT", "v" -> "STRING").struct
    val feed = Seq(
      """{"old":[{"id":1,"v":"a"}],"data":[{"id":9,"v":"a"}],"type":"UPDATE","ts":5,"source":{"db":"db","table":"t"}}""",
      """{"old":[{"id":2,"v":"b"}],"data":[{"id":2,"v":"b2"}],"type":"UPDATE","ts":6,"source":{"db":"db","table":"t"}}"""
    ).toDF("value")
    val out = graft.sources.CanalJson.parse(feed, schema, primaryKeys = Seq("id"))
      .orderBy(graft.operators.Changelog.SeqCol, "id")
      .select("id", "v", Changelog.OpCol).as[(Long, String, String)].collect().toSeq
    assert(out === Seq(
      (1L, "a", "DELETE"), (9L, "a", "UPDATE"),
      (2L, "b2", "UPDATE")))
  }

  test("canal serialize → parse round-trips the changelog") {
    import spark.implicits._
    val ch = Seq((1L, "x", "INSERT", 10L), (2L, "y", "DELETE", 11L), (3L, "z", "UPDATE", 12L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    val schema = graft.model.CdcSchema.of("id" -> "BIGINT", "v" -> "STRING").struct
    val back = graft.sources.CanalJson.parse(ChangelogJson.canal(ch, TableId.of("db", "t")), schema)
      .orderBy(graft.operators.Changelog.SeqCol)
      .select("id", "v", Changelog.OpCol, "__db", "__table")
      .as[(Long, String, String, String, String)].collect().toSeq
    assert(back === Seq(
      (1L, "x", "INSERT", "db", "t"),
      (2L, "y", "DELETE", "db", "t"),
      (3L, "z", "UPDATE", "db", "t")))
  }
}
