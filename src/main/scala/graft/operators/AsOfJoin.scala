package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the single most
  * recent right row at or before it in time, per key — the canonical
  * feature-attachment operator of a training-data pipeline ("state of X as
  * of this event"). Absent from both the reference (which has no joins at
  * all; SURVEY.md §2.7) and Spark's built-ins, so this is a composed
  * operator per the custom-operator ladder (compose > custom plan).
  *
  * Implementation is the union trick, NOT a per-key loop or an
  * inequality-join (which Spark plans as a broadcast nested loop —
  * quadratic):
  *   1. tag right rows (side 0) and left rows (side 1) into one frame;
  *   2. one window pass per (key) ordered by (time, side) carries the
  *      last-seen right payload forward (`last(..., ignoreNulls)` over an
  *      unbounded-preceding frame);
  *   3. keep left rows; their carried payload IS the as-of match.
  *
  * Cost: ONE hash shuffle of |L|+|R| rows + a per-partition sort — the same
  * shape as a sort-merge join, linear at 100 TB, no row explosion. Ties
  * (right.time == left.time) match inclusively: the right row sorts first
  * at equal time because side 0 < 1.
  */
object AsOfJoin {

  /** Backward as-of join (the pandas `merge_asof` default).
    *
    * @param on        time/order column present in both frames (numeric or
    *                  timestamp; must be totally ordered within a key)
    * @param by        equality key columns present in both frames
    * @param tolerance max allowed `left.on - right.on` distance — in the
    *                  column's own units for numeric `on`, in MICROSECONDS
    *                  for timestamp `on`; matches older than this become null
    * @param suffix    appended to right payload column names that collide
    *                  with left column names
    * @return left rows with right payload columns attached (null when no
    *         right row precedes)
    */
  def backward(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
               tolerance: Option[Long] = None, suffix: String = "_right"): DataFrame =
    joined(left, right, on, by, tolerance, suffix, forwardDir = false)

  /** Forward as-of join: attach the EARLIEST right row at or after each left
    * row (`merge_asof(direction='forward')`) — e.g. "the next maintenance
    * event after this reading". Same union-trick cost shape as [[backward]].
    */
  def forward(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
              tolerance: Option[Long] = None, suffix: String = "_right"): DataFrame =
    joined(left, right, on, by, tolerance, suffix, forwardDir = true)

  private def joined(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
                     tolerance: Option[Long], suffix: String, forwardDir: Boolean): DataFrame = {
    require(by.nonEmpty, "as-of join needs at least one `by` key column")
    val payloadCols = right.columns.toSeq.filterNot(c => by.contains(c) || c == on)
    val outNames = payloadCols.map(c => if (left.columns.contains(c)) s"$c$suffix" else c)

    // tolerance ordinal: µs for timestamp columns (a bare cast("long")
    // would truncate to whole SECONDS and misjudge sub-second tolerances),
    // plain long otherwise. Tolerance unit = µs for timestamps.
    def ordinal(df: DataFrame): Column = df.schema(on).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(on))
      case org.apache.spark.sql.types.TimestampNTZType => unix_micros(col(on).cast("timestamp"))
      case _ => col(on).cast("long")
    }

    // one tagged frame: left columns + boxed right payload (+ right's own
    // `on` so tolerance can compare against it)
    val rightBoxed = right.select(
      by.map(col) ++ Seq(col(on), lit(0).as("__side"),
        struct((payloadCols.map(col) :+ ordinal(right).as("__r_on")): _*).as("__r"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          left.schema.filterNot(f => by.contains(f.name) || f.name == on))).as("__l")): _*)
    val leftBoxed = left.select(
      by.map(col) ++ Seq(col(on), lit(1).as("__side"),
        lit(null).cast(rightBoxed.schema("__r").dataType).as("__r"),
        struct(left.columns.filterNot(c => by.contains(c) || c == on).map(col).toSeq: _*).as("__l")): _*)

    // backward: latest right at-or-before → ascending scan carries the last
    // right seen. forward: earliest right at-or-after → DESCENDING scan does
    // the same trick mirrored (right still sorts before left at equal time:
    // order __side ascending in both, ties stay inclusive).
    val timeOrder = if (forwardDir) col(on).desc else col(on).asc
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightBoxed.unionByName(leftBoxed)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val leftOrd = left.schema(on).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(on))
      case org.apache.spark.sql.types.TimestampNTZType => unix_micros(col(on).cast("timestamp"))
      case _ => col(on).cast("long")
    }
    val age: Column =
      if (forwardDir) col("__match.__r_on") - leftOrd
      else leftOrd - col("__match.__r_on")
    val inRange: Column = tolerance match {
      case Some(t) => col("__match").isNotNull && age <= t
      case None    => col("__match").isNotNull
    }
    carried.select(
      by.map(col) ++ Seq(col(on)) ++
        left.columns.filterNot(c => by.contains(c) || c == on).map(c => col(s"__l.$c").as(c)) ++
        payloadCols.zip(outNames).map { case (c, out) =>
          when(inRange, col(s"__match.$c")).otherwise(lit(null)).as(out)
        }: _*)
  }
}
