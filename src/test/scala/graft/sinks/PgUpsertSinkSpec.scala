package graft.sinks

import graft.SparkSpec
import graft.model._
import graft.operators.Changelog
import org.apache.spark.sql.functions._

/** Integration proof of the JDBC upsert sink against a REAL PostgreSQL 15
  * server ([[PgHarness]]), not the fake-JDBC proxy: the reference fork's core
  * addition is its DSQL (PostgreSQL-family) sink
  * (DsqlBatchSinkFunction.java:838-934 COPY full load, :1729-1761 ON CONFLICT
  * upsert, :1276/:1370 batched UPDATE/DELETE) and it shipped with NO tests
  * (SURVEY.md §5.4); this spec is the coverage it never had.
  *
  * Covers: CreateTable DDL → COPY full load → CDC upsert/update/delete
  * batches → induced mid-batch failure with REAL "current transaction is
  * aborted" (25P02) semantics → retry converges → final table state equals
  * the `Changelog.materialize` oracle → schema-evolution DDL round-trips.
  *
  * Transient failures are induced with a statement-level trigger gated on a
  * PostgreSQL SEQUENCE: `nextval` does not roll back with the transaction,
  * so "fail the first N statement attempts, then succeed forever" is exactly
  * expressible and fully deterministic — no sleeps, no races.
  */
class PgUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def pg = PgHarness.instance
  private def cf(p: PgHarness.Pg): () => java.sql.Connection = {
    val url = p.url // capture the string, not the harness, for executor closures
    () => java.sql.DriverManager.getConnection(url)
  }

  private def sql(p: PgHarness.Pg, stmts: String*): Unit = {
    val c = p.connect()
    try { val st = c.createStatement(); stmts.foreach(st.execute); st.close() } finally c.close()
  }

  private def queryRows(p: PgHarness.Pg, q: String): Seq[Seq[Any]] = {
    val c = p.connect()
    try {
      val rs = c.createStatement().executeQuery(q)
      val n = rs.getMetaData.getColumnCount
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.toSeq
    } finally c.close()
  }

  private val usersSchema = CdcSchema.of("id" -> "BIGINT", "name" -> "STRING", "score" -> "INT")
    .copy(primaryKeys = Seq("id"))

  test("COPY full load streams a snapshot through the real COPY protocol") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "copy_load")
    sql(p, UpsertSql.dropTable(id), UpsertSql.createTable(id, usersSchema))

    val snapshot = spark.range(10000)
      .select(col("id"), concat(lit("user-"), col("id")).as("name"), (col("id") % 97).cast("int").as("score"))
    new UpsertWriter(cf(p)).fullLoad(snapshot, id, usersSchema, chunkRows = 1500)

    assert(queryRows(p, """SELECT count(*), sum("score") FROM "public"."copy_load"""").head ===
      Seq(10000L, snapshot.agg(sum("score")).as[Long].head))
    assert(queryRows(p, """SELECT "name" FROM "public"."copy_load" WHERE "id" = 9999""").head === Seq("user-9999"))
    // and the fast path really was COPY, not the INSERT fallback
    val c = p.connect()
    try assert(PgCopy.copyIn(c, UpsertSql.copy(id, usersSchema), Iterator("10000,extra,1")))
    finally c.close()
    assert(queryRows(p, """SELECT count(*) FROM "public"."copy_load"""").head === Seq(10001L))
  }

  test("COPY round-trips hostile CSV values: nulls, quotes, newlines, commas") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "copy_csv")
    val schema = CdcSchema.of("id" -> "BIGINT", "v" -> "STRING").copy(primaryKeys = Seq("id"))
    sql(p, UpsertSql.dropTable(id), UpsertSql.createTable(id, schema))

    val hostile = Seq(
      (1L, "plain"),
      (2L, "comma,inside"),
      (3L, "say \"hi\""),
      (4L, "line\nbreak"),
      (5L, null.asInstanceOf[String]),
      (6L, "trailing space "),
      (7L, "unicode: żółć 試験"),
      (8L, "") // empty string ≠ NULL: must survive the COPY CSV encoding
    )
    new UpsertWriter(cf(p)).fullLoad(hostile.toDF("id", "v"), id, schema)

    val back = queryRows(p, """SELECT "id", "v" FROM "public"."copy_csv" ORDER BY "id"""")
      .map(r => (r.head.asInstanceOf[Number].longValue, r(1).asInstanceOf[String]))
    assert(back === hostile.map { case (i, v) => (i, v) })
    // the empty string loaded as '', not NULL (unquoted empty = NULL in COPY CSV)
    assert(queryRows(p,
      """SELECT count(*) FROM "public"."copy_csv" WHERE "id" = 8 AND "v" = ''""").head === Seq(1L))
  }

  test("fullLoad re-execution after committed chunks converges (task retry)") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "copy_retry")
    sql(p, UpsertSql.dropTable(id), UpsertSql.createTable(id, usersSchema))

    def snapshot(tag: String) = spark.range(3000)
      .select(col("id"), concat(lit(tag), col("id")).as("name"), (col("id") % 7).cast("int").as("score"))

    // first attempt commits all chunks
    new UpsertWriter(cf(p)).fullLoad(snapshot("v1-"), id, usersSchema, chunkRows = 500)
    // a Spark task re-execution (executor loss / speculation) replays the
    // whole partition including chunks that already committed: before the
    // staged merge this raised a PK violation on the COPY fast path
    new UpsertWriter(cf(p)).fullLoad(snapshot("v2-"), id, usersSchema, chunkRows = 500)

    assert(queryRows(p, """SELECT count(*) FROM "public"."copy_retry"""").head === Seq(3000L))
    assert(queryRows(p,
      """SELECT count(*) FROM "public"."copy_retry" WHERE "name" LIKE 'v2-%'""").head === Seq(3000L))
  }

  test("CDC batches upsert/update/delete; final state equals the materialize oracle") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "cdc_users")
    sql(p, UpsertSql.dropTable(id))
    val sink = new JdbcUpsertSink(cf(p), batchSize = 50)
    sink.applySchemaChange(CreateTableEvent(id, usersSchema))

    // batch 1: snapshot inserts for keys 0..199
    val b1 = spark.range(200)
      .select(col("id"), concat(lit("u"), col("id")).as("name"), lit(1).cast("int").as("score"))
      .withColumn(Changelog.OpCol, lit("INSERT")).withColumn(Changelog.SeqCol, col("id"))
    sink.write(id, b1, usersSchema)

    // batch 2: update evens, delete multiples of 3, re-insert one deleted key later in-batch
    val b2 = spark.range(200).select(
      col("id"),
      concat(lit("u"), col("id"), lit("-v2")).as("name"),
      lit(2).cast("int").as("score"),
      when(col("id") % 3 === 0, "DELETE").otherwise("UPDATE").as(Changelog.OpCol),
      (col("id") + 1000).as(Changelog.SeqCol)
    ).unionByName(Seq((9L, "reborn", 3, "REPLACE", 5000L))
      .toDF("id", "name", "score", Changelog.OpCol, Changelog.SeqCol))
    sink.write(id, b2, usersSchema)

    val oracle = Changelog.materialize(b1.unionByName(b2), usersSchema.primaryKeys)
      .select("id", "name", "score").as[(Long, String, Int)].collect().toSet
    val actual = queryRows(p, """SELECT "id", "name", "score" FROM "public"."cdc_users"""")
      .map(r => (r.head.asInstanceOf[Number].longValue, r(1).asInstanceOf[String],
        r(2).asInstanceOf[Number].intValue)).toSet
    assert(actual === oracle)
    assert(actual.contains((9L, "reborn", 3))) // within-batch seq ordering respected
    assert(!actual.exists(_._1 == 12L)) // deleted key really gone
  }

  test("mid-batch failure aborts the real transaction (25P02) and retry converges") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "retry_users")
    sql(p,
      UpsertSql.dropTable(id),
      "DROP SEQUENCE IF EXISTS fail_seq",
      UpsertSql.createTable(id, usersSchema),
      "CREATE SEQUENCE fail_seq",
      """CREATE OR REPLACE FUNCTION fail_first_attempts() RETURNS trigger AS $$
        |BEGIN
        |  IF nextval('fail_seq') <= 2 THEN
        |    RAISE EXCEPTION 'induced transient failure (attempt %)', currval('fail_seq');
        |  END IF;
        |  RETURN NEW;
        |END $$ LANGUAGE plpgsql""".stripMargin,
      """CREATE TRIGGER t_fail BEFORE INSERT ON "public"."retry_users"
        |FOR EACH STATEMENT EXECUTE FUNCTION fail_first_attempts()""".stripMargin)

    val batch = spark.range(100)
      .select(col("id"), concat(lit("r"), col("id")).as("name"), lit(7).cast("int").as("score"))
      .withColumn(Changelog.OpCol, lit("INSERT")).withColumn(Changelog.SeqCol, col("id"))
    // real server aborts the tx on the trigger error; the writer must roll
    // back and re-bind — with the first TWO statement attempts failing, only
    // a correct resetTx path can land all 100 rows exactly once
    new UpsertWriter(cf(p), batchSize = 25, maxRetries = 5, initialBackoffMs = 5L)
      .writeBatch(batch, id, usersSchema)

    assert(queryRows(p, """SELECT count(*), min("score") FROM "public"."retry_users"""").head ===
      Seq(100L, 7))
    // the trigger genuinely fired and failed attempts before converging
    val fired = queryRows(p, "SELECT last_value FROM fail_seq").head.head.asInstanceOf[Number].longValue
    assert(fired > 2L, s"trigger should have failed twice then passed statements, saw $fired")
  }

  test("exhausted retries surface the server's SQLException, not silence") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "always_fails")
    sql(p,
      UpsertSql.dropTable(id),
      UpsertSql.createTable(id, usersSchema),
      """CREATE OR REPLACE FUNCTION always_fail() RETURNS trigger AS $$
        |BEGIN RAISE EXCEPTION 'permanent failure'; RETURN NEW; END
        |$$ LANGUAGE plpgsql""".stripMargin,
      """CREATE TRIGGER t_always BEFORE INSERT ON "public"."always_fails"
        |FOR EACH STATEMENT EXECUTE FUNCTION always_fail()""".stripMargin)
    val batch = Seq((1L, "x", 1, "INSERT", 1L)).toDF("id", "name", "score", Changelog.OpCol, Changelog.SeqCol)
    val e = intercept[org.apache.spark.SparkException] {
      new UpsertWriter(cf(p), maxRetries = 1, initialBackoffMs = 1L).writeBatch(batch, id, usersSchema)
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(_.getMessage.contains("permanent failure")))
  }

  test("schema-evolution DDL round-trips on a live server") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "evolve_t")
    sql(p, UpsertSql.dropTable(id))
    val sink = new JdbcUpsertSink(cf(p), applyDestructive = true)
    sink.applySchemaChange(CreateTableEvent(id, usersSchema))
    sink.applySchemaChange(AddColumnEvent(id, "age", org.apache.spark.sql.types.IntegerType))
    sink.applySchemaChange(RenameColumnEvent(id, "age", "years"))
    // widening INT -> BIGINT auto-applied (LENIENT/EVOLVE registry only widens)
    sink.applySchemaChange(AlterColumnTypeEvent(id, "years", org.apache.spark.sql.types.LongType))

    def colType(c: String): String = queryRows(p,
      s"""SELECT data_type FROM information_schema.columns
         |WHERE table_name = 'evolve_t' AND column_name = '$c'""".stripMargin)
      .headOption.map(_.head.toString).getOrElse("<absent>")
    assert(colType("years") === "bigint")
    assert(colType("age") === "<absent>")

    // data still writable after evolution at the evolved schema
    val evolved = usersSchema.withColumn("years", org.apache.spark.sql.types.LongType)
    val row = Seq((1L, "a", 10, 33L, "INSERT", 1L))
      .toDF("id", "name", "score", "years", Changelog.OpCol, Changelog.SeqCol)
    sink.write(id, row, evolved)
    assert(queryRows(p, """SELECT "years" FROM "public"."evolve_t" WHERE "id" = 1""").head ===
      Seq(33L))

    sink.applySchemaChange(TruncateTableEvent(id))
    assert(queryRows(p, """SELECT count(*) FROM "public"."evolve_t"""").head === Seq(0L))
    sink.applySchemaChange(DropTableEvent(id))
    assert(queryRows(p,
      "SELECT count(*) FROM information_schema.tables WHERE table_name = 'evolve_t'").head === Seq(0L))
  }

  test("non-widening AlterColumnType is gated; widening auto-applies") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "gate_t")
    sql(p, UpsertSql.dropTable(id))
    val sink = new JdbcUpsertSink(cf(p)) // applyDestructive = false
    sink.applySchemaChange(CreateTableEvent(id,
      CdcSchema.of("id" -> "BIGINT", "amount" -> "DOUBLE").copy(primaryKeys = Seq("id"))))

    def colType(c: String): String = queryRows(p,
      s"""SELECT data_type FROM information_schema.columns
         |WHERE table_name = 'gate_t' AND column_name = '$c'""".stripMargin).head.head.toString

    // narrowing DOUBLE -> INT would round values via USING ::type: must be
    // skipped (logged), leaving the live column untouched
    sink.applySchemaChange(AlterColumnTypeEvent(id, "amount", org.apache.spark.sql.types.IntegerType))
    assert(colType("amount") === "double precision")

    // widening DOUBLE -> TEXT is lossless: auto-applied without the opt-in
    sink.applySchemaChange(AlterColumnTypeEvent(id, "amount", org.apache.spark.sql.types.StringType))
    assert(colType("amount") === "text")

    // the destructive opt-in forces the narrowing through
    val forced = new JdbcUpsertSink(cf(p), applyDestructive = true)
    forced.applySchemaChange(AlterColumnTypeEvent(id, "id", org.apache.spark.sql.types.IntegerType))
    assert(colType("id") === "integer")
    sql(p, UpsertSql.dropTable(id))
  }

  test("decimal precision/scale narrowing is gated; true decimal widening applies") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "gate_dec")
    sql(p, UpsertSql.dropTable(id),
      """CREATE TABLE "public"."gate_dec" ("id" BIGINT PRIMARY KEY, "amt" NUMERIC(10,2), "cnt" INTEGER)""")
    val sink = new JdbcUpsertSink(cf(p)) // applyDestructive = false

    def numType(c: String): (String, Int, Int) = {
      val r = queryRows(p,
        s"""SELECT data_type, coalesce(numeric_precision, -1), coalesce(numeric_scale, -1)
           |FROM information_schema.columns
           |WHERE table_name = 'gate_dec' AND column_name = '$c'""".stripMargin).head
      (r.head.toString, r(1).asInstanceOf[Number].intValue, r(2).asInstanceOf[Number].intValue)
    }

    // information_schema says 'numeric' for every precision: the name alone
    // would wave NUMERIC(10,2) -> NUMERIC(5,2) through; the gate must not
    sink.applySchemaChange(AlterColumnTypeEvent(id, "amt",
      org.apache.spark.sql.types.DecimalType(5, 2)))
    assert(numType("amt") === ("numeric", 10, 2))
    // scale growth without integer-digit headroom loss IS lossless
    sink.applySchemaChange(AlterColumnTypeEvent(id, "amt",
      org.apache.spark.sql.types.DecimalType(14, 4)))
    assert(numType("amt") === ("numeric", 14, 4))
    // INTEGER -> DECIMAL(5,2) cannot hold every int: gated
    sink.applySchemaChange(AlterColumnTypeEvent(id, "cnt",
      org.apache.spark.sql.types.DecimalType(5, 2)))
    assert(numType("cnt")._1 === "integer")
    // INTEGER -> DECIMAL(12,2) has the 10 integer digits: applies
    sink.applySchemaChange(AlterColumnTypeEvent(id, "cnt",
      org.apache.spark.sql.types.DecimalType(12, 2)))
    assert(numType("cnt") === ("numeric", 12, 2))
    sql(p, UpsertSql.dropTable(id))
  }

  test("streaming pipeline lands debezium batches in the live database") {
    assume(pg.isDefined, "no PostgreSQL server available")
    val p = pg.get
    val id = TableId.of("public", "pipe_t")
    sql(p, UpsertSql.dropTable(id))
    val schema = CdcSchema.of("id" -> "BIGINT", "name" -> "STRING").copy(primaryKeys = Seq("id"))
    val sink = new JdbcUpsertSink(cf(p))
    val pipe = new graft.streaming.StreamingPipeline(new graft.operators.SchemaRegistry(), sink = sink)
    pipe.applySchemaChange(CreateTableEvent(id, schema))
    pipe.processBatch(Seq(
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c","ts_ms":1,"source":{"db":"public","table":"pipe_t"}}""",
      """{"before":{"id":1,"name":"a"},"after":{"id":1,"name":"a2"},"op":"u","ts_ms":2,"source":{"db":"public","table":"pipe_t"}}""",
      """{"before":null,"after":{"id":2,"name":"b"},"op":"c","ts_ms":3,"source":{"db":"public","table":"pipe_t"}}""",
      """{"before":{"id":2,"name":"b"},"after":null,"op":"d","ts_ms":4,"source":{"db":"public","table":"pipe_t"}}"""
    ).toDF("value"), 0L)
    val rows = queryRows(p, """SELECT "id", "name" FROM "public"."pipe_t"""")
      .map(r => (r.head.asInstanceOf[Number].longValue, r(1).asInstanceOf[String]))
    assert(rows === Seq((1L, "a2")))
  }
}
