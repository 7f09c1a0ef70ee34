package graft.sinks

import graft.model.{CdcSchema, TableId}
import org.apache.spark.sql.types._

/** SQL generation for the PostgreSQL/DSQL-style upsert sink.
  *
  * Ports the write-path behavior of the reference's DSQL sink
  * (flink-cdc-pipeline-connector-dsql/.../sink/DsqlBatchSinkFunction.java):
  * full-load via `COPY ... FROM STDIN (FORMAT CSV)` (:838-934), CDC via
  * batched `INSERT ... ON CONFLICT (pk) DO UPDATE` (:1729-1761), batched
  * UPDATE (:1276) / DELETE (:1370); type mapping per `DsqlSchemaMapper`
  * (utils/DsqlSchemaMapper.java:211-221 — unknown types fall back to TEXT).
  *
  * Pure SQL-string builders: unit-testable without a database; the executor
  * side is `UpsertWriter`.
  */
object UpsertSql {

  /** CDC type → Postgres/DSQL DDL type (DsqlSchemaMapper semantics). */
  def pgType(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType | ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMPTZ"
    case TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BYTEA"
    case _ => "TEXT" // unknown → TEXT, DsqlSchemaMapper.java:211-221
  }

  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  def qualified(id: TableId): String =
    Seq(id.schemaName, id.tableName).filter(_.nonEmpty).map(q).mkString(".")

  def createTable(id: TableId, schema: CdcSchema, ifNotExists: Boolean = true): String = {
    val cols = schema.struct.fields.map(f => s"${q(f.name)} ${pgType(f.dataType)}")
    val pk = if (schema.primaryKeys.nonEmpty)
      Seq(s"PRIMARY KEY (${schema.primaryKeys.map(q).mkString(", ")})") else Nil
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ine${qualified(id)} (${(cols ++ pk).mkString(", ")})"
  }

  /** Bulk-load statement for the initial snapshot phase. */
  def copy(id: TableId, schema: CdcSchema): String =
    s"COPY ${qualified(id)} (${schema.columnNames.map(q).mkString(", ")}) FROM STDIN (FORMAT CSV)"

  /** COPY into the per-attempt staging table of [[UpsertWriter.fullLoad]]. */
  def copyStage(stage: String, schema: CdcSchema): String =
    s"COPY ${q(stage)} (${schema.columnNames.map(q).mkString(", ")}) FROM STDIN (FORMAT CSV)"

  /** Session-scoped staging table for one COPY chunk: `TEMP` makes it
    * private to the connection (no cross-executor collisions) and
    * `ON COMMIT DROP` ties its lifetime to the chunk transaction, so a
    * failed attempt leaves nothing behind.
    */
  def createStage(stage: String, id: TableId): String =
    s"CREATE TEMP TABLE ${q(stage)} (LIKE ${qualified(id)}) ON COMMIT DROP"

  /** Merge a staged COPY chunk into the target: the upsert makes re-running
    * an already-committed chunk (Spark task retry / speculation) converge
    * instead of violating the primary key.
    */
  def insertFromStage(id: TableId, stage: String, schema: CdcSchema): String = {
    val cols = schema.columnNames
    val pks = schema.primaryKeys
    require(pks.nonEmpty, s"staged full load requires primary keys on $id")
    val nonPk = cols.filterNot(pks.contains)
    val update =
      if (nonPk.isEmpty) "DO NOTHING"
      else s"DO UPDATE SET ${nonPk.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")}"
    s"INSERT INTO ${qualified(id)} (${cols.map(q).mkString(", ")}) " +
      s"SELECT ${cols.map(q).mkString(", ")} FROM ${q(stage)} " +
      s"ON CONFLICT (${pks.map(q).mkString(", ")}) $update"
  }

  /** One CSV line for the COPY payload (DsqlBatchSinkFunction.java:838-934
    * encodes rows the same way): null → empty field, quotes doubled, fields
    * containing separator/quote/newline quoted. An empty STRING is emitted
    * as `""` — a quoted empty field is an empty string to COPY CSV while an
    * unquoted one is NULL (the reference keeps the two apart with an
    * explicit `\N` marker, DsqlBatchSinkFunction.java:141,854). Runs
    * executor-side per partition, streamed into the copy channel.
    */
  def csvLine(values: Seq[Any]): String = values.map {
    case null => ""
    case v =>
      val s = v match {
        case b: Array[Byte] => "\\x" + b.map("%02x".format(_)).mkString
        case other => other.toString
      }
      if (s.isEmpty) "\"\""
      else if (s.contains(",") || s.contains("\"") || s.contains("\n") || s.contains("\r"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
  }.mkString(",")

  /** Upsert for the CDC phase (INSERT and REPLACE both land here — REPLACE is
    * upsert-by-definition, DsqlBatchSinkFunction.java:1729-1761).
    */
  def insertOnConflict(id: TableId, schema: CdcSchema): String = {
    val cols = schema.columnNames
    val pks = schema.primaryKeys
    require(pks.nonEmpty, s"upsert sink requires primary keys on $id")
    val nonPk = cols.filterNot(pks.contains)
    val update =
      if (nonPk.isEmpty) "DO NOTHING"
      else s"DO UPDATE SET ${nonPk.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")}"
    s"INSERT INTO ${qualified(id)} (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${pks.map(q).mkString(", ")}) $update"
  }

  def update(id: TableId, schema: CdcSchema): String = {
    val nonPk = schema.columnNames.filterNot(schema.primaryKeys.contains)
    s"UPDATE ${qualified(id)} SET ${nonPk.map(c => s"${q(c)} = ?").mkString(", ")} " +
      s"WHERE ${schema.primaryKeys.map(c => s"${q(c)} = ?").mkString(" AND ")}"
  }

  def delete(id: TableId, schema: CdcSchema): String =
    s"DELETE FROM ${qualified(id)} WHERE ${schema.primaryKeys.map(c => s"${q(c)} = ?").mkString(" AND ")}"

  /** SQL dialect for position-sensitive DDL: PostgreSQL/DSQL cannot place a
    * column anywhere but last, MySQL-family targets honor FIRST/AFTER. The
    * reference's AddColumnEvent carries the position either way
    * (common/event/AddColumnEvent.java:48-75); for PG targets it is honored
    * in the registry's logical schema order while the physical table appends.
    */
  sealed trait Dialect
  object Dialect {
    case object Postgres extends Dialect
    case object MySql extends Dialect
  }

  /** CDC type → MySQL DDL type (the MySql dialect cannot reuse [[pgType]]:
    * TIMESTAMPTZ / DOUBLE PRECISION / BYTEA are not MySQL types).
    */
  def mysqlType(dt: DataType): String = dt match {
    case BooleanType => "TINYINT(1)"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP(6)"
    case TimestampNTZType => "DATETIME(6)"
    case BinaryType => "BLOB"
    case _ => "TEXT"
  }

  /** MySQL identifier quoting: backticks — stock MySQL (without ANSI_QUOTES)
    * treats double quotes as string literals.
    */
  private def qMy(ident: String): String = "`" + ident.replace("`", "``") + "`"

  private def qualifiedMy(id: TableId): String =
    Seq(id.schemaName, id.tableName).filter(_.nonEmpty).map(qMy).mkString(".")

  /** DDL for a schema change applied by the sink's MetadataApplier
    * (common/sink/MetadataApplier.java:33-50). `IF NOT EXISTS` is
    * PostgreSQL-only (MySQL proper rejects it; only MariaDB accepts it),
    * so the MySql dialect emits plain ADD COLUMN — appliers there rely on
    * the registry not re-sending applied events.
    */
  def addColumn(id: TableId, name: String, dt: DataType,
                position: graft.model.ColumnPosition = graft.model.ColumnPosition.Last,
                dialect: Dialect = Dialect.Postgres): String = {
    import graft.model.ColumnPosition
    dialect match {
      case Dialect.Postgres => // PG appends; logical order kept in the registry
        s"ALTER TABLE ${qualified(id)} ADD COLUMN IF NOT EXISTS ${q(name)} ${pgType(dt)}"
      case Dialect.MySql =>
        val posClause = position match {
          case ColumnPosition.Last => ""
          case ColumnPosition.First => " FIRST"
          case ColumnPosition.Before(other) =>
            // MySQL has no BEFORE — the reference normalizes BEFORE(x) to AFTER(predecessor-of-x)
            // at the applier (AddColumnEvent.java:48-75); here the caller resolves it.
            throw new IllegalArgumentException(s"BEFORE($other) must be resolved to AFTER(...) for MySQL DDL")
          case ColumnPosition.After(other) => s" AFTER ${qMy(other)}"
        }
        s"ALTER TABLE ${qualifiedMy(id)} ADD COLUMN ${qMy(name)} ${mysqlType(dt)}$posClause"
    }
  }
  def dropColumn(id: TableId, name: String): String =
    s"ALTER TABLE ${qualified(id)} DROP COLUMN IF EXISTS ${q(name)}"
  def renameColumn(id: TableId, from: String, to: String): String =
    s"ALTER TABLE ${qualified(id)} RENAME COLUMN ${q(from)} TO ${q(to)}"
  def truncate(id: TableId): String = s"TRUNCATE TABLE ${qualified(id)}"
  /** Widening type change; `USING` makes non-implicit casts (e.g. INT→TEXT)
    * explicit so the statement succeeds wherever the cast is defined.
    */
  def alterColumnType(id: TableId, name: String, dt: DataType): String =
    s"ALTER TABLE ${qualified(id)} ALTER COLUMN ${q(name)} TYPE ${pgType(dt)} USING ${q(name)}::${pgType(dt)}"
  def dropTable(id: TableId): String = s"DROP TABLE IF EXISTS ${qualified(id)}"
}
