package graft.model

import org.apache.spark.sql.types._

/** Reference type lattice → Spark SQL types (SURVEY.md §1.3).
  *
  * The reference declares SQL-style types via `DataTypes`
  * (flink-cdc-common/src/main/java/org/apache/flink/cdc/common/types/DataTypes.java:41-430).
  * Conventions with no native Spark slot:
  *   - TIME(p)         → IntegerType, millis-of-day
  *   - TIMESTAMP(p)    → TimestampNTZType (wall clock)
  *   - TIMESTAMP_LTZ   → TimestampType (instant)
  *   - TIMESTAMP_TZ    → TimestampType (original zone dropped; keep a zone column if needed)
  */
object CdcTypes {

  private val DecimalRe = """(?i)DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val SizedStrRe = """(?i)(?:CHAR|VARCHAR)\s*\(\s*(\d+)\s*\)""".r
  private val SizedBinRe = """(?i)(?:BINARY|VARBINARY)\s*\(\s*(\d+)\s*\)""".r
  private val ArrayRe = """(?i)ARRAY\s*<(.+)>""".r
  private val MapRe = """(?i)MAP\s*<(.+)>""".r
  private val TimeRe = """(?i)TIME(?:\s*\(\s*\d+\s*\))?""".r
  private val TsRe = """(?i)TIMESTAMP(?:\s*\(\s*\d+\s*\))?""".r
  private val TsLtzRe = """(?i)TIMESTAMP_LTZ(?:\s*\(\s*\d+\s*\))?""".r
  private val TsTzRe = """(?i)TIMESTAMP_TZ(?:\s*\(\s*\d+\s*\))?""".r

  /** Parse a reference-style type string into a Spark DataType. */
  def parse(s: String): DataType = s.trim match {
    case t if t.equalsIgnoreCase("BOOLEAN")                                  => BooleanType
    case t if t.equalsIgnoreCase("TINYINT")                                  => ByteType
    case t if t.equalsIgnoreCase("SMALLINT")                                 => ShortType
    case t if t.equalsIgnoreCase("INT") || t.equalsIgnoreCase("INTEGER")     => IntegerType
    case t if t.equalsIgnoreCase("BIGINT")                                   => LongType
    case t if t.equalsIgnoreCase("FLOAT")                                    => FloatType
    case t if t.equalsIgnoreCase("DOUBLE")                                   => DoubleType
    case DecimalRe(p, sc)                                                    => DecimalType(p.toInt, sc.toInt)
    case t if t.equalsIgnoreCase("DECIMAL")                                  => DecimalType(10, 0)
    case SizedStrRe(_)                                                       => StringType
    case t if t.equalsIgnoreCase("STRING") || t.equalsIgnoreCase("CHAR") ||
              t.equalsIgnoreCase("VARCHAR")                                  => StringType
    case SizedBinRe(_)                                                       => BinaryType
    case t if t.equalsIgnoreCase("BYTES") || t.equalsIgnoreCase("BINARY") ||
              t.equalsIgnoreCase("VARBINARY")                                => BinaryType
    case t if t.equalsIgnoreCase("DATE")                                     => DateType
    case TsLtzRe()                                                           => TimestampType
    case TsTzRe()                                                            => TimestampType
    case TimeRe()                                                            => IntegerType
    case TsRe()                                                              => TimestampNTZType
    case ArrayRe(el)                                                         => ArrayType(parse(el))
    case MapRe(kv) =>
      // split key,value at top level (no nested generics in reference configs)
      val idx = topLevelComma(kv)
      MapType(parse(kv.substring(0, idx)), parse(kv.substring(idx + 1)))
    case other => throw new IllegalArgumentException(s"unknown CDC type: $other")
  }

  private def topLevelComma(s: String): Int = {
    var depth = 0
    s.zipWithIndex.collectFirst {
      case ('<', _) if { depth += 1; false } => -1
      case ('>', _) if { depth -= 1; false } => -1
      case (',', i) if depth == 0 => i
    }.getOrElse(throw new IllegalArgumentException(s"bad MAP type: $s"))
  }

  /** Numeric widening order used by schema merging; higher = wider. */
  private def numericRank(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(1)
    case ShortType => Some(2)
    case IntegerType => Some(3)
    case LongType => Some(4)
    case _: DecimalType => Some(5)
    case FloatType => Some(6)
    case DoubleType => Some(7)
    case _ => None
  }

  /** Widest common type of two columns, mirroring the reference's N→1 route
    * merging rules (runtime/operators/schema/common/SchemaDerivator.java:347,
    * `deduceMergedCreateTableEvent`): numeric types widen along the lattice,
    * decimals merge by max integer-digits/scale, anything irreconcilable
    * falls back to STRING.
    */
  def widerType(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (d1: DecimalType, d2: DecimalType) =>
      val intDigits = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
      val scale = math.max(d1.scale, d2.scale)
      DecimalType(math.min(intDigits + scale, DecimalType.MAX_PRECISION), scale)
    case (d: DecimalType, i @ (ByteType | ShortType | IntegerType | LongType)) =>
      widerType(d, DecimalType(integerDigits(i), 0))
    case (i @ (ByteType | ShortType | IntegerType | LongType), d: DecimalType) =>
      widerType(DecimalType(integerDigits(i), 0), d)
    case _ =>
      (numericRank(a), numericRank(b)) match {
        case (Some(ra), Some(rb)) => if (ra >= rb) a else b
        case _ => StringType // irreconcilable → STRING, like the reference
      }
  }

  private def integerDigits(dt: DataType): Int = dt match {
    case ByteType => 3
    case ShortType => 5
    case IntegerType => 10
    case LongType => 19
    case _ => 38
  }
}

/** The ZONED-timestamp convention (SURVEY.md §1.3): the reference's
  * `ZonedTimestampType` (common/types/ZonedTimestampType.java,
  * `DataTypes.java:275`) keeps the ORIGINAL zone with the instant —
  * `ZonedTimestampData` renders as e.g. `2024-01-01T10:00:00.000000+05:30`.
  * Spark has no zoned-timestamp type, so the convention is a column PAIR:
  * `TimestampType` instant + an original-zone string sidecar named
  * `<col>__zone`. These helpers split an ISO-zoned wire string into the
  * pair and render the pair back — all native functions (to_timestamp /
  * regexp_extract / from_utc_timestamp / date_format), fully codegen.
  */
object ZonedTime {

  /** Sidecar column suffix: `t` (instant) pairs with `t__zone` (zone). */
  val ZoneSuffix = "__zone"

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** The instant of an ISO-8601 zoned string (`...+05:30` / `...Z`) as a
    * TimestampType (UTC instant) — Spark's ISO timestamp cast honors the
    * offset.
    */
  def instantOf(iso: Column): Column = to_timestamp(iso)

  /** The original zone of an ISO-8601 zoned string (`+05:30`, `-08:00`,
    * `Z`); null when the string carries no offset (callers decide a
    * default — the reference equally cannot invent a zone it never saw).
    */
  def zoneOf(iso: Column): Column = {
    val z = regexp_extract(iso, "(Z|[+-]\\d{2}:?\\d{2})$", 1)
    when(z === "", lit(null)).otherwise(z)
  }

  /** Render (instant, zone) back to the reference's wire form: the wall
    * clock IN the original zone plus the offset suffix — microsecond
    * precision, matching the debezium wire options
    * ([[graft.sinks.ChangelogJson.WireJsonOptions]]).
    *
    * A native codegen expression ([[graft.functions.RenderZoned]]) computing
    * the wall clock via java.time under the ROW's zone. The earlier
    * `to_utc_timestamp(from_utc_timestamp(instant, zone), current_timezone())`
    * composition only cancels the session offset when that offset is the
    * same at both evaluation points: a rendered wall clock landing in the
    * session zone's DST spring-forward gap (e.g. session America/New_York,
    * wall clock 02:30 on the transition day) got resolved an hour off. The
    * java.time path has no session-zone term at all.
    */
  def render(instant: Column, zone: Column): Column =
    graft.functions.CdcExpressions.renderZoned(instant, zone)
}
