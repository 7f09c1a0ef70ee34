package graft.model

import org.apache.spark.sql.types.{DataType, StructType}

/** JSON wire form of the [[SchemaChangeEvent]] hierarchy — DDL-as-data for
  * the change feed, like the reference shipping typed `SchemaChangeEvent`s
  * in-band with the row events (SURVEY.md §1.1). A control record is
  * `{"__graft_schema_change__": {...}}` on the same `value: STRING` feed as
  * the debezium rows; [[graft.streaming.StreamingPipeline.processBatch]]
  * detects and applies them at the micro-batch boundary (the reference's
  * SchemaOperator equally blocks the stream at the event).
  *
  * Data types use Catalyst's canonical `DataType.json`/`fromJson` — no
  * bespoke type grammar.
  */
object SchemaChangeJson {

  val Marker = "__graft_schema_change__"

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def tid(e: Event): String = esc(e.tableId.toString)

  def toJson(e: SchemaChangeEvent): String = {
    val body = e match {
      case CreateTableEvent(_, schema) =>
        val pks = schema.primaryKeys.map(p => s""""${esc(p)}"""").mkString("[", ",", "]")
        s""""event":"CreateTable","schema":${schema.struct.json},"primaryKeys":$pks"""
      case AddColumnEvent(_, name, dt, pos) =>
        val p = pos match {
          case ColumnPosition.Last => """"last""""
          case ColumnPosition.First => """"first""""
          case ColumnPosition.Before(o) => s""""before:${esc(o)}""""
          case ColumnPosition.After(o) => s""""after:${esc(o)}""""
        }
        s""""event":"AddColumn","name":"${esc(name)}","dataType":${dt.json},"position":$p"""
      case DropColumnEvent(_, name) => s""""event":"DropColumn","name":"${esc(name)}""""
      case RenameColumnEvent(_, from, to) =>
        s""""event":"RenameColumn","from":"${esc(from)}","to":"${esc(to)}""""
      case AlterColumnTypeEvent(_, name, t) =>
        s""""event":"AlterColumnType","name":"${esc(name)}","dataType":${t.json}"""
      case DropTableEvent(_) => s""""event":"DropTable""""
      case TruncateTableEvent(_) => s""""event":"TruncateTable""""
    }
    s"""{"$Marker":{"table":"${tid(e)}",$body}}"""
  }

  /** Parse one control record (the full feed line). */
  def parse(line: String): SchemaChangeEvent = {
    // Jackson ships with Spark — driver-side only, control events are rare
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(line).get(Marker)
    require(root != null, s"not a schema-change control record: $line")
    val table = TableId.parse(root.get("table").asText())
    def dt(field: String): DataType = DataType.fromJson(root.get(field).toString)
    root.get("event").asText() match {
      case "CreateTable" =>
        val struct = DataType.fromJson(root.get("schema").toString).asInstanceOf[StructType]
        val pks = Option(root.get("primaryKeys")).map { n =>
          (0 until n.size()).map(i => n.get(i).asText())
        }.getOrElse(Nil)
        CreateTableEvent(table, CdcSchema(struct, primaryKeys = pks))
      case "AddColumn" =>
        val pos = root.get("position").asText() match {
          case "last" => ColumnPosition.Last
          case "first" => ColumnPosition.First
          case s if s.startsWith("before:") => ColumnPosition.Before(s.stripPrefix("before:"))
          case s if s.startsWith("after:") => ColumnPosition.After(s.stripPrefix("after:"))
        }
        AddColumnEvent(table, root.get("name").asText(), dt("dataType"), pos)
      case "DropColumn" => DropColumnEvent(table, root.get("name").asText())
      case "RenameColumn" => RenameColumnEvent(table, root.get("from").asText(), root.get("to").asText())
      case "AlterColumnType" => AlterColumnTypeEvent(table, root.get("name").asText(), dt("dataType"))
      case "DropTable" => DropTableEvent(table)
      case "TruncateTable" => TruncateTableEvent(table)
      case other => throw new IllegalArgumentException(s"unknown schema-change event: $other")
    }
  }

  /** Is this feed line REALLY a control record: valid JSON whose top level
    * carries the marker field. The stream-side prefilter is a cheap
    * `contains` probe, so a data row whose payload TEXT merely mentions the
    * marker also reaches this check — it must come back false and stay a
    * data row (never fed to [[parse]]).
    */
  def isControl(line: String): Boolean = {
    if (line == null || !line.contains(s""""$Marker"""")) return false
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      root != null && root.isObject && root.has(Marker) && root.get(Marker).isObject
    } catch { case _: Exception => false }
  }
}
