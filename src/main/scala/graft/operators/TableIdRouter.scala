package graft.operators

import graft.model.{Selectors, TableId}

/** One route rule: `source-table` selector → `sink-table`, with optional
  * `replace-symbol` substitution of the source table name into the sink name.
  *
  * Mirrors runtime/operators/schema/common/TableIdRouter.java:42-100 and
  * docs/content/docs/core-concept/route.md:33-77.
  */
final case class RouteRule(
    sourceTable: String,
    sinkTable: String,
    replaceSymbol: Option[String] = None,
    description: Option[String] = None
) {
  lazy val selectors: Selectors = Selectors.parse(sourceTable)
}

final class TableIdRouter(rules: Seq[RouteRule]) {
  private val cache = new java.util.concurrent.ConcurrentHashMap[TableId, Seq[TableId]]()

  /** All sink tables a source table routes to; identity when no rule matches.
    * A table matching several rules fans out to all of them (reference allows
    * 1→N replication via multiple route blocks).
    */
  def route(id: TableId): Seq[TableId] = cache.computeIfAbsent(id, { id =>
    val hits = rules.filter(_.selectors.matches(id)).map { r =>
      r.replaceSymbol match {
        case Some(sym) => TableId.parse(r.sinkTable.replace(sym, id.tableName))
        case None      => TableId.parse(r.sinkTable)
      }
    }
    if (hits.isEmpty) Seq(id) else hits
  })

  /** Reverse lookup: which of `upstream` route into `sink`? Used by N→1 schema
    * merging (SchemaDerivator.java:107-152).
    */
  def sourcesFor(sink: TableId, upstream: Seq[TableId]): Seq[TableId] =
    upstream.filter(u => route(u).contains(sink))
}
