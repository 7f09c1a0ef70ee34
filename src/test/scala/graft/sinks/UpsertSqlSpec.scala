package graft.sinks

import graft.model.{CdcSchema, ColumnPosition, TableId}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pure SQL-string builders: no database, no Spark session. */
class UpsertSqlDialectSpec extends AnyFunSuite {

  private val id = TableId.of("public", "t")

  test("csvLine keeps null and empty string distinct") {
    // unquoted empty = NULL to COPY CSV; quoted empty = empty string
    assert(UpsertSql.csvLine(Seq(null, "", "x")) === ",\"\",x")
    assert(UpsertSql.csvLine(Seq("a,b", "q\"q", "line\nbreak")) ===
      "\"a,b\",\"q\"\"q\",\"line\nbreak\"")
  }

  test("mysql dialect emits executable MySQL DDL") {
    val sql = UpsertSql.addColumn(id, "ts", TimestampType,
      ColumnPosition.After("id"), UpsertSql.Dialect.MySql)
    // backtick quoting: stock MySQL (no ANSI_QUOTES) reads "..." as strings
    assert(sql === "ALTER TABLE `public`.`t` ADD COLUMN `ts` TIMESTAMP(6) AFTER `id`")
    assert(!sql.contains("IF NOT EXISTS")) // MariaDB-only syntax
    assert(UpsertSql.mysqlType(DoubleType) === "DOUBLE")
    assert(UpsertSql.mysqlType(BinaryType) === "BLOB")
    assert(UpsertSql.mysqlType(TimestampNTZType) === "DATETIME(6)")
    assert(UpsertSql.addColumn(id, "n", IntegerType, ColumnPosition.First,
      UpsertSql.Dialect.MySql).endsWith("`n` INT FIRST"))
    intercept[IllegalArgumentException] {
      UpsertSql.addColumn(id, "n", IntegerType, ColumnPosition.Before("x"),
        UpsertSql.Dialect.MySql)
    }
  }

  test("postgres dialect keeps idempotent IF NOT EXISTS and pg types") {
    assert(UpsertSql.addColumn(id, "ts", TimestampType) ===
      """ALTER TABLE "public"."t" ADD COLUMN IF NOT EXISTS "ts" TIMESTAMPTZ""")
  }

  test("staged full-load statements: temp stage, copy, merge") {
    val schema = CdcSchema.of("id" -> "BIGINT", "v" -> "STRING").copy(primaryKeys = Seq("id"))
    assert(UpsertSql.createStage("_s", id) ===
      """CREATE TEMP TABLE "_s" (LIKE "public"."t") ON COMMIT DROP""")
    assert(UpsertSql.copyStage("_s", schema) ===
      """COPY "_s" ("id", "v") FROM STDIN (FORMAT CSV)""")
    assert(UpsertSql.insertFromStage(id, "_s", schema) ===
      """INSERT INTO "public"."t" ("id", "v") SELECT "id", "v" FROM "_s" """.trim +
        """ ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v"""")
  }
}
