package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, SQLException, Statement}
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.model.{CdcSchema, TableId}
import graft.operators.Changelog

import scala.jdk.CollectionConverters._

/** Capturing fake JDBC driver: proxies Connection/PreparedStatement and
  * records every executed batch row — lets the executor-side upsert writer
  * run without a database (the reference's DSQL connector shipped with no
  * tests at all; SURVEY.md §5.4).
  */
object FakeJdbc {
  final case class Exec(sql: String, params: Seq[Any])
  val executed = new ConcurrentLinkedQueue[Exec]()
  @volatile var failuresToInject = 0

  def reset(): Unit = { executed.clear(); failuresToInject = 0 }

  private class Ps(sql: String, conn: Conn) extends InvocationHandler {
    private val params = scala.collection.mutable.Map.empty[Int, Any]
    private val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    override def invoke(proxy: Object, m: Method, args: Array[Object]): Object = m.getName match {
      case "setObject" =>
        params(args(0).asInstanceOf[Int]) = args(1); null
      case "addBatch" =>
        batches += params.toSeq.sortBy(_._1).map(_._2); params.clear(); null
      case "clearBatch" => batches.clear(); null
      case "executeBatch" =>
        // PostgreSQL/DSQL semantics: a failed statement aborts the whole
        // transaction — every later statement fails until rollback()
        if (conn.aborted)
          throw new SQLException("current transaction is aborted, commands ignored until end of transaction block")
        if (failuresToInject > 0) {
          failuresToInject -= 1
          conn.aborted = true
          throw new SQLException("injected transient failure")
        }
        batches.foreach(b => executed.add(Exec(sql, b)))
        val n = batches.size; batches.clear()
        Array.fill(n)(1)
      case "close" => null
      case _ => null
    }
  }

  private class Conn extends InvocationHandler {
    @volatile var aborted = false
    override def invoke(proxy: Object, m: Method, args: Array[Object]): Object = m.getName match {
      case "prepareStatement" =>
        Proxy.newProxyInstance(getClass.getClassLoader,
          Array(classOf[PreparedStatement]), new Ps(args(0).asInstanceOf[String], this))
      case "createStatement" =>
        Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Statement]),
          (_: Object, sm: Method, sargs: Array[Object]) => sm.getName match {
            case "execute" => executed.add(Exec(sargs(0).asInstanceOf[String], Nil)); Boolean.box(true)
            case _ => null
          })
      case "commit" =>
        if (aborted) throw new SQLException("current transaction is aborted")
        null
      case "rollback" => aborted = false; null
      case "setAutoCommit" | "close" => null
      case "isClosed" => Boolean.box(false)
      case _ => null
    }
  }

  def connection(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]), new Conn)
      .asInstanceOf[Connection]
}

class UpsertWriterSpec extends SparkSpec {
  import spark.implicits._

  private val id = TableId.of("public", "users")
  private val schema = CdcSchema.of("id" -> "BIGINT", "name" -> "STRING")
    .copy(primaryKeys = Seq("id"))

  private def changelog = Seq(
    (1L, "a", "INSERT", 1L),
    (1L, "a2", "UPDATE", 2L),  // supersedes seq 1 within the batch
    (2L, "b", "INSERT", 3L),
    (2L, "b", "DELETE", 4L),   // tombstone wins for key 2
    (3L, "c", "REPLACE", 5L)
  ).toDF("id", "name", Changelog.OpCol, Changelog.SeqCol)

  test("writeBatch dedups to last image per PK, upserts survivors, deletes tombstones") {
    FakeJdbc.reset()
    new UpsertWriter(() => FakeJdbc.connection(), batchSize = 2)
      .writeBatch(changelog, id, schema)
    val execs = FakeJdbc.executed.asScala.toSeq
    val upserts = execs.filter(_.sql.startsWith("INSERT INTO"))
    val deletes = execs.filter(_.sql.startsWith("DELETE"))
    assert(upserts.map(_.params).toSet === Set(Seq(1L, "a2"), Seq(3L, "c")))
    assert(deletes.map(_.params) === Seq(Seq(2L)))
    assert(upserts.head.sql ===
      """INSERT INTO "public"."users" ("id", "name") VALUES (?, ?) ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name"""")
  }

  test("JdbcUpsertSink applies derived DDL and data through the streaming pipeline") {
    import graft.model._
    import graft.operators.SchemaRegistry
    FakeJdbc.reset()
    val sink = new JdbcUpsertSink(() => FakeJdbc.connection(), batchSize = 100)
    val pipe = new graft.streaming.StreamingPipeline(new SchemaRegistry(), sink = sink)
    val src = TableId.of("public", "users")
    pipe.applySchemaChange(CreateTableEvent(src, schema))
    pipe.applySchemaChange(AddColumnEvent(src, "age", org.apache.spark.sql.types.IntegerType))
    pipe.processBatch(Seq(
      """{"before":null,"after":{"id":1,"name":"a","age":30},"op":"c","ts_ms":1,"source":{"db":"public","table":"users"}}"""
    ).toDF("value"), 0L)

    val execs = FakeJdbc.executed.asScala.toSeq
    assert(execs.exists(_.sql.startsWith("""CREATE TABLE IF NOT EXISTS "public"."users"""")))
    assert(execs.exists(_.sql === """ALTER TABLE "public"."users" ADD COLUMN IF NOT EXISTS "age" INTEGER"""))
    assert(execs.filter(_.sql.startsWith("INSERT INTO")).map(_.params) === Seq(Seq(1L, "a", 30)))
  }

  test("transient SQLExceptions are retried with backoff until success") {
    FakeJdbc.reset()
    FakeJdbc.failuresToInject = 2
    new UpsertWriter(() => FakeJdbc.connection(), batchSize = 100, initialBackoffMs = 1L)
      .writeBatch(changelog, id, schema)
    val upserts = FakeJdbc.executed.asScala.toSeq.filter(_.sql.startsWith("INSERT INTO"))
    // exact multiset: the retry must roll back the aborted transaction and
    // re-bind pending rows once — no duplicates, no stale batch replay
    assert(upserts.map(_.params).sortBy(_.head.toString) === Seq(Seq(1L, "a2"), Seq(3L, "c")))
    val deletes = FakeJdbc.executed.asScala.toSeq.filter(_.sql.startsWith("DELETE"))
    assert(deletes.map(_.params) === Seq(Seq(2L)))
  }
}
