package graft.operators

import graft.model._

import scala.collection.mutable

/** Driver-side schema registry: tracks original (upstream) and evolved (after
  * transform/route) schemas per table and applies schema-change events under
  * the configured behavior.
  *
  * Collapses the reference's coordinator machinery — `SchemaManager`
  * (runtime/operators/schema/common/SchemaManager.java), `SchemaOperator`
  * (regular/SchemaOperator.java:70,147-209) and `SchemaCoordinator`
  * (regular/SchemaCoordinator.java:85-465) — into one driver object: in the
  * micro-batch design there is no operator↔coordinator RPC and no FlushEvent
  * blocking protocol; DDL is applied between micro-batches, where the batch
  * boundary is already a global barrier (SURVEY.md §7.1).
  */
final class SchemaRegistry(val behavior: SchemaChangeBehavior = SchemaChangeBehavior.Evolve) {

  private val original = mutable.Map.empty[TableId, CdcSchema]
  private val evolved = mutable.Map.empty[TableId, CdcSchema]

  def originalSchema(id: TableId): Option[CdcSchema] = original.get(id)
  def evolvedSchema(id: TableId): Option[CdcSchema] = evolved.get(id)
  def tableIds: Seq[TableId] = original.keys.toSeq

  /** Apply one schema-change event; returns the events the SINK must apply
    * (empty when the behavior swallows the change). Mirrors
    * `SchemaDerivator.normalizeSchemaChangeEvents` lenientization
    * (runtime/operators/schema/common/SchemaDerivator.java:154-296):
    * under LENIENT, renames become adds (old column kept, nulled) and drops
    * are deferred (column kept, nulled) so existing sink consumers never break.
    */
  def apply(e: SchemaChangeEvent): Seq[SchemaChangeEvent] = {
    // original universe always tracks upstream truth
    e match {
      case CreateTableEvent(id, s) => original(id) = s
      case AddColumnEvent(id, n, dt, pos) => original.get(id).foreach(s => original(id) = s.withColumn(n, dt, pos))
      case DropColumnEvent(id, n) => original.get(id).foreach(s => original(id) = s.dropColumn(n))
      case RenameColumnEvent(id, f, t) => original.get(id).foreach(s => original(id) = s.renameColumn(f, t))
      case AlterColumnTypeEvent(id, n, dt) => original.get(id).foreach(s => original(id) = s.alterColumnType(n, dt))
      case DropTableEvent(id) => original.remove(id)
      case TruncateTableEvent(_) => ()
    }

    behavior match {
      case SchemaChangeBehavior.Exception if !e.isInstanceOf[CreateTableEvent] =>
        throw new IllegalStateException(s"schema change rejected by EXCEPTION behavior: $e")
      case SchemaChangeBehavior.Ignore if !e.isInstanceOf[CreateTableEvent] =>
        Seq.empty
      case SchemaChangeBehavior.Lenient =>
        val lenient = lenientize(e)
        lenient.foreach(applyToEvolved)
        lenient
      case _ => // EVOLVE / TRY_EVOLVE (TRY_EVOLVE differs only in sink-error tolerance)
        applyToEvolved(e)
        Seq(e)
    }
  }

  private def applyToEvolved(e: SchemaChangeEvent): Unit = e match {
    case CreateTableEvent(id, s) => evolved.getOrElseUpdate(id, s)
    case AddColumnEvent(id, n, dt, pos) => evolved.get(id).foreach(s => evolved(id) = s.withColumn(n, dt, pos))
    case DropColumnEvent(id, n) => evolved.get(id).foreach(s => evolved(id) = s.dropColumn(n))
    case RenameColumnEvent(id, f, t) => evolved.get(id).foreach(s => evolved(id) = s.renameColumn(f, t))
    case AlterColumnTypeEvent(id, n, dt) => evolved.get(id).foreach(s => evolved(id) = s.alterColumnType(n, dt))
    case DropTableEvent(id) => evolved.remove(id)
    case TruncateTableEvent(_) => ()
  }

  /** LENIENT normalization: rename → add-new-column (old stays, nulled);
    * drop → no-op (column stays, future rows null it); type change → widen.
    */
  private def lenientize(e: SchemaChangeEvent): Seq[SchemaChangeEvent] = e match {
    case RenameColumnEvent(id, from, to) =>
      evolved.get(id) match {
        case Some(s) if !s.columnNames.contains(to) =>
          Seq(AddColumnEvent(id, to, s.struct(s.struct.fieldIndex(from)).dataType))
        case _ => Seq.empty
      }
    case DropColumnEvent(_, _) => Seq.empty
    case AlterColumnTypeEvent(id, n, dt) =>
      evolved.get(id) match {
        case Some(s) =>
          val wide = CdcTypes.widerType(s.struct(s.struct.fieldIndex(n)).dataType, dt)
          Seq(AlterColumnTypeEvent(id, n, wide))
        case None => Seq(e)
      }
    case other => Seq(other)
  }
}
