package graft.operators

import graft.model.CdcTypes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** N→1 schema merging + record coercion for routed tables.
  *
  * Mirrors runtime/operators/schema/common/SchemaDerivator.java:298-390:
  * `deduceMergedCreateTableEvent` = widest-type column union preserving the
  * first-seen column order; `coerceDataRecord` = cast + null-pad each source
  * row shape into the merged shape.
  *
  * Scale note: coercion is a pure projection (casts + null literals), so it
  * stays inside WholeStageCodegen and adds no shuffle; the union of N coerced
  * sources is a narrow `unionByName`.
  */
object SchemaDerivator {

  /** Widest-type union of column sets. Column order: first appearance wins. */
  def mergeStructs(structs: Seq[StructType]): StructType = {
    require(structs.nonEmpty, "no schemas to merge")
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    for (st <- structs; f <- st.fields) {
      merged.get(f.name) match {
        case None => merged += f.name -> f.copy(nullable = true)
        case Some(prev) =>
          merged += f.name -> prev.copy(dataType = CdcTypes.widerType(prev.dataType, f.dataType))
      }
    }
    StructType(merged.values.toSeq)
  }

  /** Project `df` into `target`: cast matching columns, null-pad missing ones. */
  def coerce(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Merge-and-union N source frames into one frame with the merged schema. */
  def mergeUnion(dfs: Seq[DataFrame]): DataFrame = {
    val target = mergeStructs(dfs.map(_.schema))
    dfs.map(coerce(_, target)).reduce(_.unionByName(_))
  }

  /** DDL delta that evolves a sink table from `prev` to `next` — the
    * normalized event stream a sink's MetadataApplier receives when routed
    * source schemas change (SchemaDerivator.java:154-296: renames surface as
    * adds, widenings as type changes, drops as drops).
    */
  def diff(out: graft.model.TableId, prev: StructType, next: StructType): Seq[graft.model.SchemaChangeEvent] = {
    import graft.model._
    val prevNames = prev.fieldNames.toSet
    val nextByName = next.fields.map(f => f.name -> f).toMap
    val adds = next.fields.toSeq.filterNot(f => prevNames.contains(f.name))
      .map(f => AddColumnEvent(out, f.name, f.dataType))
    val drops = prev.fieldNames.toSeq.filterNot(nextByName.contains)
      .map(n => DropColumnEvent(out, n))
    val alters = prev.fields.toSeq
      .filter(f => nextByName.get(f.name).exists(_.dataType != f.dataType))
      .map(f => AlterColumnTypeEvent(out, f.name, nextByName(f.name).dataType))
    adds ++ alters ++ drops
  }
}
