package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ordered-funnel analysis (MATCH_RECOGNIZE's most-used special case):
  * how far does each key progress through an ordered sequence of steps,
  * where step i+1 must occur strictly AFTER the event that completed
  * step i? The classic conversion query (signup → view → purchase) that
  * Spark has no native operator for.
  *
  * Implementation: the sorted-array fold this used to be collapses to an
  * EXACT closed form with O(1) aggregation buffers. Because the funnel
  * state machine never regresses, stage s can only advance at the FIRST
  * step-s event strictly after the event that made advance s−1 — any
  * later step-s event has a strictly larger timestamp, so it can never
  * satisfy a conversion window the first one failed. The whole fold is
  * therefore the chain
  *
  *   a₀ = min(ts,seq) over step-0 events            (no window)
  *   aₛ = min(ts,seq) over step-s events with (ts,seq) > aₛ₋₁
  *        and ts ≤ aₛ₋₁.ts + gapUs                  (else the chain stops)
  *
  * computed as `steps.length` sequential min-aggregations, each with a
  * CONSTANT-size buffer per key. No `collect_list`: a bot key with 10⁷
  * step events costs 10⁷ shuffled rows (unavoidable — they must reach the
  * key's reducer) but O(1) aggregation memory, where the array fold built
  * a 10⁷-struct buffer. Every pass filters to one step type before its
  * shuffle, so total shuffle volume across passes equals the single
  * shuffle of the old design; each advance frame is persisted so the
  * chain's lineage is evaluated once. Integer stages, pinned (ts, seq)
  * order: deterministic under any partitioning, and the DuckDB oracle
  * replays the identical `list_reduce` fold.
  */
object Funnel {

  /** Per-key funnel stage: (keyCol, stage) where stage = how many steps of
    * `steps` completed in order (0..steps.length), each advance within
    * `gapUs` of the event that made the PREVIOUS advance (the conversion
    * window; the first step has no window). `seqCol` breaks ties on equal
    * timestamps — REQUIRED for determinism.
    */
  def stages(events: DataFrame, keyCol: String, tsCol: String, seqCol: String,
             typeCol: String, steps: Seq[String], gapUs: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    require(steps.length <= 16,
      s"funnel of ${steps.length} steps: each step is one Spark job pass; " +
        "16 is far beyond any real conversion funnel and bounds misuse")
    val stepIx = steps.zipWithIndex.toMap
    val stepOf = steps.foldLeft(lit(-1L): Column)((acc, s) =>
      when(col(typeCol) === s, lit(stepIx(s).toLong)).otherwise(acc))
    // only step-typed events ride any shuffle
    val slim = events
      .select(col(keyCol), col(tsCol).as("f_ts"), col(seqCol).as("f_seq"),
        stepOf.as("f_step"))
      .where(col("f_step") >= 0)

    // advance frames persist so the chain's lineage is evaluated once per
    // pass; they are slim (3 longs per key) and MEMORY_AND_DISK, and are
    // explicitly unpersisted once the (eagerly checkpointed) result is
    // materialized — a long-lived session running many funnels must not
    // accumulate cached frames and lean on LRU eviction
    def chainMin(df: DataFrame): DataFrame = df
      .groupBy(col(keyCol))
      .agg(min(struct(col("f_ts"), col("f_seq"))).as("a"))
      .select(col(keyCol), col("a.f_ts").as("a_ts"), col("a.f_seq").as("a_seq"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // advance 0: the earliest step-0 event per key, unconditionally
    var adv = chainMin(slim.where(col("f_step") === 0))
    val advances = Seq.newBuilder[DataFrame]
    advances += adv
    for (s <- 1 until steps.length) {
      // the only candidate for advance s is the earliest step-s event
      // strictly after a_{s-1} — filter the window BEFORE the min: the
      // window is an upper bound on ts, so the overall-first candidate
      // is in-window iff any candidate is
      adv = chainMin(slim.where(col("f_step") === s)
        .join(adv, Seq(keyCol))
        .where(struct(col("f_ts"), col("f_seq")) >
            struct(col("a_ts"), col("a_seq")) &&
          col("f_ts") <= col("a_ts") + lit(gapUs)))
      advances += adv
    }
    // stage = number of advances made; advance sets are prefix-nested
    // (adv_s keys ⊆ adv_{s-1} keys) so max(s+1) == the count. Keys with
    // step-typed events but no advance report stage 0.
    val frames = advances.result()
    val reached = frames.zipWithIndex
      .map { case (a, i) => a.select(col(keyCol), lit(i + 1L).as("stage")) }
      .reduce(_ unionAll _)
      .groupBy(col(keyCol)).agg(max("stage").as("stage"))
    // eager localCheckpoint (2 longs per key — strictly smaller than the
    // frames it replaces) so the chain can be unpersisted immediately; the
    // checkpointed result is reclaimed by the ContextCleaner when the
    // caller drops it
    try slim.select(col(keyCol)).distinct()
      .join(reached, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("stage"), lit(0L)).as("stage"))
      .localCheckpoint()
    finally frames.foreach { f => f.unpersist(); () } // even on a failed job
  }

  /** Funnel report: keys per stage reached (keys absent from `events`
    * entirely cannot be counted here — that join is the caller's).
    */
  def report(events: DataFrame, keyCol: String, tsCol: String, seqCol: String,
             typeCol: String, steps: Seq[String], gapUs: Long): DataFrame =
    stages(events, keyCol, tsCol, seqCol, typeCol, steps, gapUs)
      .groupBy("stage").agg(count(lit(1)).as("n_keys"))
}
