package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("TableId parse round-trips 1/2/3-part identifiers") {
    assert(TableId.parse("t") === TableId.tableOnly("t"))
    assert(TableId.parse("s.t") === TableId.of("s", "t"))
    assert(TableId.parse("n.s.t") === TableId.of("n", "s", "t"))
    assert(TableId.parse("n.s.t").identifier === "n.s.t")
  }

  test("Selectors match per-part regexes like the reference") {
    val sel = Selectors.parse("db\\.*.user_\\.*")
    assert(sel.matches(TableId.of("db1", "user_1")))
    assert(sel.matches(TableId.of("db2", "user_accounts")))
    assert(!sel.matches(TableId.of("other", "user_1")))
    // 1-part pattern matches the table name only
    assert(Selectors.parse("orders").matches(TableId.of("any", "orders")))
    // comma-separated union
    val multi = Selectors.parse("tpch.customer,tpch.supplier")
    assert(multi.matches(TableId.of("tpch", "customer")))
    assert(multi.matches(TableId.of("tpch", "supplier")))
    assert(!multi.matches(TableId.of("tpch", "orders")))
  }

  test("CdcTypes parses the reference type lattice") {
    assert(CdcTypes.parse("INT") === IntegerType)
    assert(CdcTypes.parse("BIGINT") === LongType)
    assert(CdcTypes.parse("DECIMAL(20,4)") === DecimalType(20, 4))
    assert(CdcTypes.parse("VARCHAR(32)") === StringType)
    assert(CdcTypes.parse("TIMESTAMP(6)") === TimestampNTZType)
    assert(CdcTypes.parse("TIMESTAMP_LTZ(3)") === TimestampType)
    assert(CdcTypes.parse("TIME(3)") === IntegerType) // millis-of-day convention
    assert(CdcTypes.parse("ARRAY<INT>") === ArrayType(IntegerType))
    assert(CdcTypes.parse("MAP<STRING, INT>") === MapType(StringType, IntegerType))
  }

  test("widerType follows the numeric lattice with STRING fallback") {
    assert(CdcTypes.widerType(IntegerType, LongType) === LongType)
    assert(CdcTypes.widerType(LongType, DoubleType) === DoubleType)
    assert(CdcTypes.widerType(IntegerType, DecimalType(10, 2)) === DecimalType(12, 2))
    assert(CdcTypes.widerType(StringType, IntegerType) === StringType)
    assert(CdcTypes.widerType(BooleanType, DateType) === StringType)
  }

  test("CdcSchema column operations preserve key bookkeeping") {
    val s = CdcSchema.of("id" -> "INT", "name" -> "STRING").copy(primaryKeys = Seq("id"))
    val s2 = s.withColumn("age", IntegerType, ColumnPosition.After("id"))
    assert(s2.columnNames === Seq("id", "age", "name"))
    val s3 = s2.renameColumn("id", "uid")
    assert(s3.primaryKeys === Seq("uid"))
    val s4 = s3.dropColumn("age")
    assert(s4.columnNames === Seq("uid", "name"))
    assert(s4.alterColumnType("uid", LongType).struct("uid").dataType === LongType)
  }

  test("SchemaChangeBehavior parses all five modes") {
    assert(SchemaChangeBehavior.of("lenient") === SchemaChangeBehavior.Lenient)
    assert(SchemaChangeBehavior.of("TRY_EVOLVE") === SchemaChangeBehavior.TryEvolve)
    assertThrows[IllegalArgumentException](SchemaChangeBehavior.of("nope"))
  }
}
