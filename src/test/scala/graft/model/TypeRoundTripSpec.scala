package graft.model

import graft.SparkSpec
import graft.operators.Changelog
import graft.sinks.{ChangelogJson, UpsertSql}
import graft.sources.{DebeziumJson, ValuesSource}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FIXTURES.md §4: one table exercising the full type lattice, round-tripped
  * through schema parse → DataFrame → debezium-json → parse → materialize,
  * plus the sink DDL mapping.
  */
class TypeRoundTripSpec extends SparkSpec {

  private val allTypes = CdcSchema.of(
    "c_bool" -> "BOOLEAN", "c_i8" -> "TINYINT", "c_i16" -> "SMALLINT",
    "c_i32" -> "INT", "c_i64" -> "BIGINT", "c_f32" -> "FLOAT", "c_f64" -> "DOUBLE",
    "c_dec" -> "DECIMAL(20,4)", "c_str" -> "STRING",
    "c_date" -> "DATE", "c_time" -> "TIME(3)", "c_ts" -> "TIMESTAMP(6)",
    "c_arr" -> "ARRAY<INT>", "c_map" -> "MAP<STRING, INT>"
  ).copy(primaryKeys = Seq("c_i32"))

  test("every reference type parses to the documented Spark type") {
    val expected = Seq(BooleanType, ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, DecimalType(20, 4), StringType,
      DateType, IntegerType /* TIME → millis-of-day */, TimestampNTZType,
      ArrayType(IntegerType), MapType(StringType, IntegerType))
    assert(allTypes.struct.fields.map(_.dataType).toSeq === expected)
  }

  test("values → debezium-json → parse → materialize round-trips a fully-typed row") {
    val t = TableId.of("db", "t_all")
    val row = Seq(
      true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5d,
      new java.math.BigDecimal("1234.5678"), "hello",
      java.sql.Date.valueOf("2024-03-05"), 3_600_000,
      java.time.LocalDateTime.parse("2024-03-05T10:30:00"),
      Seq(1, 2, 3), Map("a" -> 1))
    val events = Seq(DataChangeEvent.insert(t, row))
    val df = ValuesSource.toChangelog(spark, allTypes, events)

    val json = ChangelogJson.debezium(df, t)
    val back = DebeziumJson.parse(json, allTypes.struct)
    val out = Changelog.materialize(back.drop("__db", "__table"), allTypes.primaryKeys)

    assert(out.count() === 1)
    val r = out.select(allTypes.columnNames.map(col): _*).head()
    assert(r.getBoolean(0) === true)
    assert(r.getByte(1) === 1.toByte)
    assert(r.getLong(4) === 4L)
    assert(r.getDecimal(7) === new java.math.BigDecimal("1234.5678"))
    assert(r.getString(8) === "hello")
    assert(r.getDate(9) === java.sql.Date.valueOf("2024-03-05"))
    assert(r.getInt(10) === 3_600_000)
    assert(r.getSeq[Int](12) === Seq(1, 2, 3))
    assert(r.getMap[String, Int](13) === Map("a" -> 1))
  }

  test("sink DDL maps the whole lattice (unknowns → TEXT)") {
    val ddl = UpsertSql.createTable(TableId.of("public", "t_all"), allTypes)
    assert(ddl.contains(""""c_bool" BOOLEAN"""))
    assert(ddl.contains(""""c_i8" SMALLINT"""))
    assert(ddl.contains(""""c_dec" NUMERIC(20,4)"""))
    assert(ddl.contains(""""c_ts" TIMESTAMP"""))
    assert(ddl.contains(""""c_arr" TEXT""")) // no native pg slot → TEXT
    assert(ddl.contains("""PRIMARY KEY ("c_i32")"""))
  }

  test("ZonedTime splits and re-renders ISO-zoned strings losslessly") {
    import spark.implicits._
    val isos = Seq(
      "2024-03-05T10:30:00.123456+05:30",
      "2024-03-05T10:30:00.000001-08:00",
      "2024-12-31T23:59:59.999999Z",
      "2024-06-15T00:00:00.000000+01:00")
    val df = isos.toDF("iso").select(
      col("iso"),
      ZonedTime.instantOf(col("iso")).as("t"),
      ZonedTime.zoneOf(col("iso")).as("z"))
    // zone extracted verbatim
    assert(df.select("z").as[String].collect().toSeq ===
      Seq("+05:30", "-08:00", "Z", "+01:00"))
    // instant honors the offset: +05:30 wall 10:30 = 05:00 UTC
    assert(df.where(col("z") === "+05:30")
      .select(unix_micros(col("t"))).as[Long].head() ===
      java.time.Instant.parse("2024-03-05T05:00:00.123456Z").toEpochMilli * 1000 + 456)
    // render(instant, zone) reproduces the exact wire string
    assert(df.select(ZonedTime.render(col("t"), col("z")).as("r"), col("iso"))
      .where(col("r") =!= col("iso")).count() === 0)
    // no offset in the string → null zone (callers decide the default)
    assert(Seq("2024-03-05T10:30:00").toDF("iso")
      .select(ZonedTime.zoneOf(col("iso"))).head().isNullAt(0))
  }

  test("render is session-zone independent (Cli sets the session zone from local-time-zone)") {
    import spark.implicits._
    val isos = Seq("2024-03-05T10:30:00.123456+05:30", "2024-12-31T23:59:59.999999Z")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val df = isos.toDF("iso").select(
        col("iso"),
        ZonedTime.instantOf(col("iso")).as("t"),
        ZonedTime.zoneOf(col("iso")).as("z"))
      assert(df.select(ZonedTime.render(col("t"), col("z")).as("r"), col("iso"))
        .where(col("r") =!= col("iso")).count() === 0)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("render survives a wall clock in the session zone's DST spring-forward gap") {
    import spark.implicits._
    // +05:30 wall 02:30 on 2024-03-10 = 2024-03-09T21:00Z; 02:30 does not
    // exist in America/New_York that day (spring forward), so any render
    // that round-trips through the session zone shifts it an hour.
    val iso = "2024-03-10T02:30:00.000000+05:30"
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val df = Seq(iso).toDF("iso").select(
        ZonedTime.instantOf(col("iso")).as("t"),
        ZonedTime.zoneOf(col("iso")).as("z"))
      assert(df.select(ZonedTime.render(col("t"), col("z"))).as[String].head() === iso)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("multi-table values event set materializes both tables") {
    val db = new graft.sinks.ValuesDatabase
    db.applyAll(ValuesSource.singleSplitMultiTable)
    val t1 = TableId.of("default_namespace", "default_schema", "table1")
    val t2 = TableId.of("default_namespace", "default_schema", "table2")
    assert(db.results(t1) === Seq(Seq("1", "1"), Seq("2", "2")))
    assert(db.results(t2) === Seq(Seq("1", "x")))
  }
}
