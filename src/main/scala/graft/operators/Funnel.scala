package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis (MATCH_RECOGNIZE's most-used special case):
  * how far does each key progress through an ordered sequence of steps,
  * where step i+1 must occur strictly AFTER the event that completed
  * step i? The classic conversion query (signup → view → purchase) that
  * Spark has no native operator for.
  *
  * Implementation: ONE shuffle by key, then a per-key state-machine fold
  * over the time-ordered event array — `aggregate` over
  * `array_sort(collect_list(struct(ts, seq, step)))`, stage advancing when
  * the next event matches the next step. Integer stages, pinned
  * (ts, seq) order: deterministic under any partitioning, and the DuckDB
  * oracle replays the identical `list_reduce`. The per-key array is
  * key-bounded (the DSIR/LM array stance); a key with 10⁸ events wants a
  * windowed pre-filter to the step types first — which the `steps`
  * projection already is: only events whose type IS a step ride the
  * shuffle.
  */
object Funnel {

  /** Per-key funnel stage: (keyCol, stage) where stage = how many steps of
    * `steps` completed in order (0..steps.length), each advance within
    * `gapUs` of the event that made the PREVIOUS advance (the conversion
    * window; the first step has no window). `seqCol` breaks ties on equal
    * timestamps — REQUIRED for determinism. State is an (stage, last_ts)
    * LONG pair folded left over the (ts, seq)-sorted step events.
    */
  def stages(events: DataFrame, keyCol: String, tsCol: String, seqCol: String,
             typeCol: String, steps: Seq[String], gapUs: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    val stepIx = steps.zipWithIndex.toMap
    val stepOf = steps.foldLeft(lit(-1L): Column)((acc, s) =>
      when(col(typeCol) === s, lit(stepIx(s).toLong)).otherwise(acc))
    // only step-typed events ride the shuffle
    val slim = events
      .select(col(keyCol), col(tsCol).as("f_ts"), col(seqCol).as("f_seq"),
        stepOf.as("f_step"))
      .where(col("f_step") >= 0)
    slim.groupBy(col(keyCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col("f_ts"), col("f_seq"), col("f_step")))),
        array(lit(0L), lit(0L)),
        (acc, e) => when(e("f_step") === element_at(acc, 1) &&
            (element_at(acc, 1) === 0L || e("f_ts") <= element_at(acc, 2) + lit(gapUs)),
          array(element_at(acc, 1) + lit(1L), e("f_ts"))).otherwise(acc),
        acc => element_at(acc, 1))
        .as("stage"))
  }

  /** Funnel report: keys per stage reached (keys absent from `events`
    * entirely cannot be counted here — that join is the caller's).
    */
  def report(events: DataFrame, keyCol: String, tsCol: String, seqCol: String,
             typeCol: String, steps: Seq[String], gapUs: Long): DataFrame =
    stages(events, keyCol, tsCol, seqCol, typeCol, steps, gapUs)
      .groupBy("stage").agg(count(lit(1)).as("n_keys"))
}
