package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time disorder measurement — the tool that PICKS a watermark delay
  * instead of guessing one. For each event, its lateness is how far the
  * event-time FRONTIER (the running max event time in arrival order) had
  * already advanced past the event's own timestamp when the event arrived:
  * exactly the quantity a `withWatermark(delay)` bounds. The lateness
  * distribution therefore reads directly as the completeness/latency
  * trade-off: a delay at the p99.9 lateness keeps 99.9% of events inside
  * state eviction (Akidau et al., "The Dataflow Model", VLDB 2015 — the
  * heuristic-watermark framing).
  *
  * Scale design: the frontier is a running MAX over total arrival order —
  * naively `max(ts) OVER (ORDER BY arrival)`, a SINGLE-partition window at
  * 100 TB. This is the same two-phase prefix-scan shape as
  * [[graft.ops.Pack.withOffsets]] (max replaces sum): band by equal-width
  * ranges of the numeric arrival key (a pure function of the row — lineage
  * recomputes agree), per-band maxima collect (B values, independent of
  * row count) and their exclusive prefix-max broadcasts back, and the
  * within-band running max is a window PARTITIONED by band — parallel.
  * The profile then folds per-row lateness into a fixed bucket histogram:
  * one bounded all-BIGINT aggregation, exact at any scale.
  */
object Lateness {

  /** Add `late_us` (frontier − own ts, ≥ 0) to each row. `arrivalCol` must
    * be numeric (a monotone ingest offset/sequence); pass `tieBreak`
    * columns when it can collide — frontier positions must be TOTALLY
    * ordered to be deterministic. `tsUsCol` is the event-time in BIGINT µs.
    */
  def withLateness(df: DataFrame, arrivalCol: String, tsUsCol: Column,
                   partitions: Int = 0, tieBreak: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    df.schema(arrivalCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case t => throw new IllegalArgumentException(
        s"withLateness arrival key '$arrivalCol' must be numeric, got $t")
    }
    val stats = df.agg(min(col(arrivalCol).cast("long")),
      max(col(arrivalCol).cast("long"))).head()
    val (mn, mx) =
      if (stats.isNullAt(0)) (0L, 0L) else (stats.getLong(0), stats.getLong(1))
    val width = ((BigInt(mx) - BigInt(mn)) / p + 1).toDouble
    val pid = least(greatest(
      floor((col(arrivalCol).cast("double") - lit(mn.toDouble)) / lit(width)), lit(0)),
      lit(p - 1)).cast("int")

    val banded = df
      .withColumn("__pid", coalesce(pid, lit(0)))
      .withColumn("__ts", tsUsCol.cast("long"))
      .repartitionByRange(p, col("__pid"))

    // B values to the driver — the only non-distributed step
    val maxima = banded.groupBy("__pid")
      .agg(coalesce(max("__ts"), lit(Long.MinValue)).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // EXCLUSIVE prefix max: the frontier the band inherits from every
    // earlier-arriving band; band 0 inherits nothing
    val bases = (0 until p).scanLeft(Long.MinValue)((acc, i) =>
      math.max(acc, maxima.getOrElse(i, Long.MinValue))).take(p)
    val baseFor: Column => Column =
      b => element_at(lit(bases.toArray), b + 1)

    val local = Window.partitionBy("__pid")
      .orderBy((arrivalCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded
      .withColumn("__frontier",
        greatest(baseFor(col("__pid")), max("__ts").over(local)))
      .withColumn("late_us", col("__frontier") - col("__ts"))
      .drop("__pid", "__ts", "__frontier")
  }

  /** Lateness histogram over half-open µs bounds: bucket i counts events
    * with `boundsUs(i-1) < late_us <= boundsUs(i)` (bucket 0 = on-frontier
    * events, the last = beyond every bound — the rows a watermark at the
    * largest bound would drop). One bounded integer aggregation; the
    * `bucket_le_us` column carries the bound itself so the result reads as
    * a watermark-delay decision table.
    */
  def profile(df: DataFrame, arrivalCol: String, tsUsCol: Column,
              boundsUs: Seq[Long] = Seq(0L, 1000000L, 10000000L, 60000000L,
                600000000L), tieBreak: Seq[String] = Nil): DataFrame = {
    require(boundsUs == boundsUs.sorted && boundsUs.headOption.contains(0L),
      "boundsUs must be ascending and start at 0")
    val cases = boundsUs.map(b => s"WHEN late_us <= ${b}L THEN ${b}L")
      .mkString("CASE ", " ", " ELSE -1L END") // -1 = beyond every bound
    withLateness(df, arrivalCol, tsUsCol, tieBreak = tieBreak)
      .select(expr(cases).as("bucket_le_us"))
      .groupBy("bucket_le_us")
      .agg(count(lit(1)).as("cnt"))
  }
}
