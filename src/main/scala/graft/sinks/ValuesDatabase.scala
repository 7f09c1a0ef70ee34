package graft.sinks

import graft.model._
import scala.collection.mutable

/** In-memory materialization oracle — the correctness backbone of the
  * reference's test suite (`ValuesDatabase`
  * flink-cdc-pipeline-connector-values/.../ValuesDatabase.java:70,236-377):
  * applies insert/update/replace/delete plus schema changes to per-table maps
  * and exposes final state for assertions.
  *
  * Driver-side, test-only: production materialization is the distributed
  * `Changelog.materialize` — specs assert the two agree.
  */
final class ValuesDatabase {
  private val schemas = mutable.LinkedHashMap.empty[TableId, CdcSchema]
  private val tables = mutable.LinkedHashMap.empty[TableId, mutable.LinkedHashMap[Seq[Any], Seq[Any]]]

  def schemaOf(id: TableId): Option[CdcSchema] = schemas.get(id)
  def tableIds: Seq[TableId] = schemas.keys.toSeq

  private def pkOf(id: TableId, row: Seq[Any]): Seq[Any] = {
    val s = schemas(id)
    val idx = s.primaryKeys.map(k => s.struct.fieldIndex(k))
    if (idx.isEmpty) row else idx.map(row)
  }

  def apply(e: Event): Unit = e match {
    case CreateTableEvent(id, schema) =>
      schemas.getOrElseUpdate(id, schema)
      tables.getOrElseUpdate(id, mutable.LinkedHashMap.empty)
    case AddColumnEvent(id, name, dt, pos) =>
      val old = schemas(id)
      val at = pos match {
        case ColumnPosition.First => 0
        case ColumnPosition.Last => old.struct.length
        case ColumnPosition.Before(c) => old.struct.fieldIndex(c)
        case ColumnPosition.After(c) => old.struct.fieldIndex(c) + 1
      }
      schemas(id) = old.withColumn(name, dt, pos)
      tables(id) = tables(id).map { case (k, v) => k -> v.patch(at, Seq(null), 0) }
    case DropColumnEvent(id, name) =>
      val old = schemas(id)
      val at = old.struct.fieldIndex(name)
      schemas(id) = old.dropColumn(name)
      tables(id) = tables(id).map { case (k, v) => k -> v.patch(at, Nil, 1) }
    case RenameColumnEvent(id, from, to) =>
      schemas(id) = schemas(id).renameColumn(from, to)
    case AlterColumnTypeEvent(id, name, dt) =>
      schemas(id) = schemas(id).alterColumnType(name, dt)
    case DropTableEvent(id) =>
      schemas.remove(id); tables.remove(id)
    case TruncateTableEvent(id) =>
      tables(id).clear()
    case DataChangeEvent(id, op, before, after, _) =>
      val t = tables(id)
      op match {
        case Op.Insert | Op.Replace => t(pkOf(id, after.get)) = after.get
        case Op.Update =>
          before.foreach(b => t.remove(pkOf(id, b)))
          t(pkOf(id, after.get)) = after.get
        case Op.Delete => t.remove(pkOf(id, before.get))
      }
  }

  def applyAll(events: Seq[Event]): Unit = events.foreach(apply)

  /** Final rows of a table (ValuesDatabase.getResults:264-276). */
  def results(id: TableId): Seq[Seq[Any]] = tables.get(id).map(_.values.toSeq).getOrElse(Nil)
}
