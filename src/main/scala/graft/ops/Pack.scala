package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order and cut into fixed `windowTokens` context windows, so
  * each document occupies the half-open token span [start, start+n) of the
  * global stream and lands in windows floor(start/W)..floor((start+n-1)/W).
  *
  * Scale design — the naive formulation is a global window function
  * (`sum(...) over (order by id)`), which Spark plans as a SINGLE partition:
  * the one-node bottleneck that kills a 100 TB run. This implementation is
  * the classic two-phase distributed prefix sum instead:
  *   1. range-repartition by the order key and sort within partitions —
  *      partitions now hold contiguous key ranges;
  *   2. per-partition token totals (P values, one per partition) collect to
  *      the driver and become broadcast base offsets;
  *   3. a window PARTITION BY partition-id ORDER BY key computes the local
  *      running sum — parallel across partitions — plus the base offset.
  * Bytes to the driver: O(partitions), independent of row count.
  */
object Pack {

  /** Add `__start` (global token offset) to each row: two-phase prefix sum
    * over `tokensCol` in (`orderCol`, tieBreak...) order. The order must be
    * TOTAL for positions to be deterministic — pass `tieBreak` columns when
    * `orderCol` can collide (e.g. a hash). Computing the band stats and base
    * offsets runs two small jobs at plan-construction time (2 + P rows to
    * the driver), like every trained/collected-model operator.
    *
    * The band id is a PURE FUNCTION of the row (equal-width bands over the
    * numeric order key's [min, max], monotone in the key), NOT
    * `spark_partition_id()` over a sampled range exchange: both passes — and
    * any lineage recompute after an executor loss — agree on the layout with
    * no pinned cache or checkpoint. Skewed keys cost band balance, never
    * correctness (a near-constant key degrades toward one band — order by a
    * high-cardinality key, that is what the operator is FOR). The order key
    * must be NUMERIC (banding and the window must agree on ordering) and the
    * input must be immutable across the construction jobs and the final
    * action (batch sources; snapshot a mutable table first).
    */
  def withOffsets(df: DataFrame, orderCol: String, tokensCol: Column,
                  partitions: Int = 0, tieBreak: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val orderCols = (orderCol +: tieBreak).map(col)
    df.schema(orderCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case t => throw new IllegalArgumentException(
        s"withOffsets order key '$orderCol' must be numeric (banding order = " +
          s"window order), got $t")
    }

    // band stats: one pruned-scan agg job (2 values to the driver)
    val stats = df.agg(min(col(orderCol).cast("long")), max(col(orderCol).cast("long"))).head()
    // null stats = empty input or all-null keys: a single band 0 keeps every
    // row (nulls order first and tieBreak orders within), offsets stay right
    val (mn, mx) =
      if (stats.isNullAt(0)) (0L, 0L) else (stats.getLong(0), stats.getLong(1))
    // width in BigInt: mx - mn overflows Long for hash-valued keys
    val width = ((BigInt(mx) - BigInt(mn)) / p + 1).toDouble
    val pid = least(greatest(
      floor((col(orderCol).cast("double") - lit(mn.toDouble)) / lit(width)), lit(0)),
      lit(p - 1)).cast("int")

    val banded = df
      .withColumn("__pid", coalesce(pid, lit(0))) // null keys band 0, nulls-first order
      .withColumn("__tok", tokensCol.cast("long"))
      // range- (not hash-) partition the p distinct band ids: hashing p ints
      // into p buckets leaves ~1/e partitions empty and stacks bands on
      // hotspots; a range exchange gives ~1 band per partition and still
      // satisfies the window's clustering on __pid
      .repartitionByRange(p, col("__pid"))

    // P rows to the driver — the only non-distributed step. coalesce: a
    // band whose every token count is null sums to null, not 0
    val totals = banded.groupBy("__pid")
      .agg(coalesce(sum("__tok"), lit(0L)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases = (0 until p).scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
    val baseFor = udfFreeBase(bases)

    val local = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded
      .withColumn("__start",
        baseFor(col("__pid")) + sum("__tok").over(local) - coalesce(col("__tok"), lit(0L)))
      .drop("__pid")
  }

  /** Base offset lookup as a literal array element_at — codegen'd, no UDF. */
  private def udfFreeBase(bases: Seq[Long]): Column => Column =
    pid => element_at(lit(bases.toArray), pid + 1)

  /** Pack documents into fixed-size context windows: (id, n_tokens, start,
    * first_window, last_window, offset_in_window). Zero-token rows occupy no
    * span and are dropped (nothing of them appears in any window).
    */
  def packWindows(df: DataFrame, orderCol: String, tokensCol: Column,
                  windowTokens: Int): DataFrame =
    withOffsets(df, orderCol, tokensCol)
      .where(col("__tok") > 0)
      .select(
        col(orderCol),
        col("__tok").as("n_tokens"),
        col("__start").as("start"),
        // integer division: `/` on columns is double division (precision
        // hazard past 2^53 on a long token stream)
        expr(s"__start DIV $windowTokens").as("first_window"),
        expr(s"(__start + __tok - 1) DIV $windowTokens").as("last_window"),
        pmod(col("__start"), lit(windowTokens.toLong)).as("offset_in_window"))

  /** Output schema of [[packBins]]: the id column keeps its input type. */
  private def binSchema(df: DataFrame, idCol: String): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      df.schema(idCol).copy(name = idCol),
      org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType,
        nullable = false),
      org.apache.spark.sql.types.StructField("bin", org.apache.spark.sql.types.IntegerType,
        nullable = false)))

  /** NO-SPLIT packing: each document lands WHOLE in exactly one bin of
    * `capacity` tokens — the packing mode SFT/instruction tuning needs when
    * attention must not cross document boundaries and truncation is
    * unacceptable ([[packWindows]] is the pretraining concat-and-cut mode;
    * this is its complement). Returns one row per kept document:
    * (id, n_tokens, band, bin) — a bin is identified by (band, bin).
    *
    * Algorithm: best-fit-decreasing per band (docs sorted tokens-desc, each
    * placed in the bin with the SMALLEST remaining capacity that still fits,
    * lowest bin id on ties; a new bin opens when none fits) — the classic
    * 11/9·OPT + 6/9 bin-packing guarantee (Johnson '73 first/best-fit
    * family; Dósa's tight FFD bound). Deterministic: the doc order
    * (tokens desc, id) and the tie-breaks are total, so the assignment is a
    * pure function of the input set.
    *
    * Scale design: a GLOBAL best-fit is a sequential fold over the whole
    * corpus — the one-node bottleneck. Instead docs are hash-banded by id
    * (`pmod(xxhash64(id), bands)` — a pure function of the row, so the
    * layout is partitioning-invariant and recompute-stable, the
    * [[withOffsets]] banding stance) and each band packs INDEPENDENTLY in
    * parallel: per-band state is one remaining-capacity entry per open bin
    * (every bin stays open in best-fit — O(band_tokens / capacity) longs, a
    * TreeMap on remaining capacity making each placement O(log bins)). The
    * price of bandedness is at most the per-band tail slack vs a global
    * pack — negligible when bands ≪ docs — and the win is that packing
    * 100 TB is an embarrassingly parallel shuffle + one sorted pass per
    * band. The sequential fold itself is genuine per-partition imperative
    * logic: `mapPartitions`, the documented last-resort tier, like
    * [[Multimodal]]'s codec batches.
    *
    * Rules: zero/null-token docs occupy no span and are dropped (the
    * [[packWindows]] stance); a doc LARGER than `capacity` cannot land
    * whole anywhere — loud executor-side refusal naming the id (truncate or
    * route oversize docs upstream; silently splitting would betray the
    * operator's contract).
    */
  def packBins(df: DataFrame, idCol: String, tokensCol: Column, capacity: Long,
               bands: Int = 0): DataFrame = {
    require(capacity >= 1, s"capacity=$capacity out of range")
    val spark = df.sparkSession
    val b = if (bands > 0) bands else spark.sessionState.conf.numShufflePartitions
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(binSchema(df, idCol))
    df.select(col(idCol), tokensCol.cast("long").as("__tok"),
        coalesce(pmod(xxhash64(col(idCol)), lit(b.toLong)), lit(0L)).cast("int").as("__band"))
      .where(col("__tok") > 0)
      // range- (not hash-) partition the b distinct band ids (see
      // withOffsets); the window-free sorted pass needs (band, tok desc, id)
      // runs, not global order
      .repartitionByRange(b, col("__band"))
      .sortWithinPartitions(col("__band"), col("__tok").desc, col(idCol))
      .mapPartitions { rows =>
        // remaining capacity -> open bin ids with exactly that remainder;
        // reset per band run (rows arrive clustered by band)
        var band = -1
        var nextBin = 0
        val byRemaining = new java.util.TreeMap[Long, java.util.TreeSet[Int]]
        rows.map { r =>
          val id = r.get(0)
          val n = r.getLong(1)
          val bd = r.getInt(2)
          if (bd != band) { band = bd; nextBin = 0; byRemaining.clear() }
          if (n > capacity) throw new IllegalArgumentException(
            s"packBins: doc $id has $n tokens > capacity $capacity — " +
              "truncate or route oversize docs upstream")
          val fit = byRemaining.ceilingEntry(n)
          val (bin, rem) = if (fit == null) {
            val fresh = nextBin; nextBin += 1
            (fresh, capacity - n)
          } else {
            val chosen = fit.getValue.first()
            if (fit.getValue.size == 1) byRemaining.remove(fit.getKey)
            else { fit.getValue.remove(chosen); () }
            (chosen, fit.getKey - n)
          }
          byRemaining.computeIfAbsent(rem, _ => new java.util.TreeSet[Int]).add(bin)
          Row(id, n, bd, bin)
        }
      }(enc)
  }

  /** Packing-efficiency report: per token-length bucket, how many context
    * windows ONE-DOC-PER-WINDOW padding would burn vs the document's actual
    * tokens — the numbers that justify concat-packing ([[packWindows]]) and
    * pick the context length. One narrow codegen projection (bucket and
    * window counts are integer arithmetic on the token count) into one
    * bounded hash aggregation — all-BIGINT sums, so the report is exact and
    * partitioning-invariant at any corpus size; docs longer than the
    * context window still count ceil(n/W) windows (their tail window pads).
    */
  def paddingStats(df: DataFrame, tokensCol: Column, windowTokens: Int,
                   bucketSize: Int = 128): DataFrame =
    df.select(tokensCol.cast("long").as("__tok"))
      .where(col("__tok") > 0)
      .select(col("__tok"),
        expr(s"__tok DIV $bucketSize * $bucketSize").as("len_bucket"),
        expr(s"(__tok + ${windowTokens - 1}) DIV $windowTokens").as("__win"))
      .groupBy("len_bucket")
      .agg(
        count(lit(1)).as("docs"),
        sum("__tok").as("tokens"),
        sum("__win").as("padded_windows"),
        (sum("__win") * windowTokens - sum("__tok")).as("waste_tokens"))
}
