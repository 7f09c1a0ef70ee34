package graft.model

import org.apache.spark.sql.types.DataType

/** Event ADT mirroring the reference's event families (SURVEY.md §1.1):
  * `DataChangeEvent` + the `SchemaChangeEvent` hierarchy
  * (flink-cdc-common/src/main/java/org/apache/flink/cdc/common/event/).
  * `FlushEvent` has no equivalent here: in the Spark design the micro-batch
  * boundary IS the flush barrier (SURVEY.md §7.1).
  */
sealed trait Event { def tableId: TableId }

/** Row-change operations (common/event/OperationType.java:26-31). */
sealed abstract class Op(val name: String)
object Op {
  case object Insert extends Op("INSERT")
  case object Update extends Op("UPDATE")
  case object Replace extends Op("REPLACE") // upsert: write regardless of prior state
  case object Delete extends Op("DELETE")
  val all: Seq[Op] = Seq(Insert, Update, Replace, Delete)
  def of(s: String): Op = all.find(_.name.equalsIgnoreCase(s))
    .getOrElse(throw new IllegalArgumentException(s"unknown op: $s"))
}

/** Row change; payloads are positional values aligned with the table's schema
  * at emission time (common/event/DataChangeEvent.java:34-98).
  */
final case class DataChangeEvent(
    tableId: TableId,
    op: Op,
    before: Option[Seq[Any]],
    after: Option[Seq[Any]],
    meta: Map[String, String] = Map.empty
) extends Event

object DataChangeEvent {
  def insert(t: TableId, row: Seq[Any]): DataChangeEvent = DataChangeEvent(t, Op.Insert, None, Some(row))
  def update(t: TableId, before: Seq[Any], after: Seq[Any]): DataChangeEvent =
    DataChangeEvent(t, Op.Update, Some(before), Some(after))
  def replace(t: TableId, row: Seq[Any]): DataChangeEvent = DataChangeEvent(t, Op.Replace, None, Some(row))
  def delete(t: TableId, row: Seq[Any]): DataChangeEvent = DataChangeEvent(t, Op.Delete, Some(row), None)
}

/** DDL-as-data hierarchy (common/event/SchemaChangeEvent.java:29,
  * SchemaChangeEventType.java:24-32).
  */
sealed trait SchemaChangeEvent extends Event
final case class CreateTableEvent(tableId: TableId, schema: CdcSchema) extends SchemaChangeEvent
final case class AddColumnEvent(tableId: TableId, name: String, dataType: DataType,
    position: ColumnPosition = ColumnPosition.Last) extends SchemaChangeEvent
final case class DropColumnEvent(tableId: TableId, name: String) extends SchemaChangeEvent
final case class RenameColumnEvent(tableId: TableId, from: String, to: String) extends SchemaChangeEvent
final case class AlterColumnTypeEvent(tableId: TableId, name: String, newType: DataType) extends SchemaChangeEvent
final case class DropTableEvent(tableId: TableId) extends SchemaChangeEvent
final case class TruncateTableEvent(tableId: TableId) extends SchemaChangeEvent

/** Schema-evolution behaviors (common/pipeline/SchemaChangeBehavior.java:27-33). */
sealed trait SchemaChangeBehavior
object SchemaChangeBehavior {
  case object Ignore extends SchemaChangeBehavior
  case object Lenient extends SchemaChangeBehavior
  case object TryEvolve extends SchemaChangeBehavior
  case object Evolve extends SchemaChangeBehavior
  case object Exception extends SchemaChangeBehavior
  def of(s: String): SchemaChangeBehavior = s.toUpperCase match {
    case "IGNORE" => Ignore
    case "LENIENT" => Lenient
    case "TRY_EVOLVE" => TryEvolve
    case "EVOLVE" => Evolve
    case "EXCEPTION" => Exception
    case other => throw new IllegalArgumentException(s"unknown behavior: $other")
  }
}
