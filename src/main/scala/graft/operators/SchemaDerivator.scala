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
}
