package graft.model

/** Up-to-3-part table identifier: `namespace.schemaName.tableName`.
  *
  * Mirrors the reference's `TableId`
  * (flink-cdc-common/src/main/java/org/apache/flink/cdc/common/event/TableId.java:48):
  * MySQL uses (database, table), PostgreSQL uses (database, schema, table),
  * single-part ids are bare table names.
  */
final case class TableId(namespace: String, schemaName: String, tableName: String) {
  def identifier: String =
    Seq(namespace, schemaName, tableName).filter(_.nonEmpty).mkString(".")
  override def toString: String = identifier
}

object TableId {
  def tableOnly(table: String): TableId = TableId("", "", table)
  def of(schema: String, table: String): TableId = TableId("", schema, table)
  def of(ns: String, schema: String, table: String): TableId = TableId(ns, schema, table)

  /** Parse `a.b.c` / `a.b` / `a` (fewest parts = table name only). */
  def parse(s: String): TableId = s.split("\\.", 3) match {
    case Array(t)       => tableOnly(t)
    case Array(s1, t)   => of(s1, t)
    case Array(n, s1, t) => of(n, s1, t)
  }
}
