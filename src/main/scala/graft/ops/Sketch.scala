package graft.ops

import graft.functions.CdcExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) for token/key frequency
  * estimation at bounded memory — the 100 TB answer to "how often does X
  * occur" when the exact vocabulary aggregation ([[Bpe.wordCounts]],
  * `q_vocab_topk`) is itself corpus-scale state. The sketch is `depth ×
  * width` counters however large the corpus; estimates only OVERCOUNT
  * (never under), with error ≤ 2N/width at ≥ 1-(1/2)^depth probability.
  *
  * Determinism: hash rows come from the engine's one hash family —
  * `h_i(x) = hash64(x) + i·(mix64(hash64(x))|1)` (the Kirsch-Mitzenmacher
  * 2-hash trick minhash already uses), bucket = low bits (width is a
  * power of two, so the signed/unsigned distinction vanishes — the same
  * bit pattern in Spark longs and the oracle's UBIGINT). The sketch is a
  * pure function of the data: reproducible across runs, partitionings and
  * engines, which is what makes it hash-comparable against a SQL replay.
  *
  * Scale shape: building is ONE hash aggregation — the depth-way explode
  * is narrow (rows × depth slim pairs), map-side partials collapse to at
  * most depth × width counters PER TASK before the shuffle, and the final
  * sketch is depth × width rows total (4 × 8192 = 32k by default) — a
  * broadcastable artifact. Estimation joins the bounded sketch TO the
  * queries, never the reverse.
  */
object Sketch {

  private def hashPairs(token: Column, depth: Int, width: Int): Column = {
    // width is a power of two, so the bucket is the LOW bits of the wrapped
    // 64-bit h1 + i·h2 — and low bits of a sum/product depend only on low
    // bits of the operands. Masking FIRST keeps every intermediate small
    // (≤ depth·width²), which matters because Spark's ANSI mode makes a
    // genuine 64-bit wrap an arithmetic error, not a wrap.
    val mask = lit((width - 1).toLong)
    val h1 = CdcExpressions.hash64(token).bitwiseAND(mask)
    val h2 = CdcExpressions.mix64(CdcExpressions.hash64(token)).bitwiseOR(lit(1L))
      .bitwiseAND(mask)
    transform(sequence(lit(0), lit(depth - 1)),
      i => struct(i.cast("int").as("row"),
        (h1 + i.cast("long") * h2).bitwiseAND(mask).as("bucket")))
  }

  /** Build the sketch from weighted tokens: (row, bucket, cnt), at most
    * depth × width rows. Weights let a pre-aggregated word-count table
    * stand in for the raw stream (same sketch by linearity).
    */
  def countMin(df: DataFrame, tokenCol: String, weight: Column,
               depth: Int = 4, width: Int = 8192): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0, "width must be a power of two")
    df.select(weight.cast("long").as("__w"),
        explode(hashPairs(col(tokenCol), depth, width)).as("p"))
      .groupBy(col("p.row").as("row"), col("p.bucket").as("bucket"))
      .agg(sum("__w").as("cnt"))
  }

  /** EXACT heavy hitters via the sketch-prefilter two-phase: pass 1 folds
    * the stream into the bounded sketch; pass 2 re-scans, keeping only
    * tokens whose sketch estimate clears `threshold` — a NARROW scan-side
    * filter (the collected sketch rides into one codegen'd array-lookup
    * expression, ≤ depth·width longs ≈ 256 KB broadcast) — and exact-counts
    * only the survivors. Because count-min never undercounts, no true
    * heavy hitter can be filtered out: the candidate set is a superset,
    * the exact verify trims it, and the output is IDENTICAL to the exact
    * full aggregation — which is exactly what the oracle checks. The
    * exact pass aggregates only candidates (few, by definition of
    * `threshold`), so its state is bounded where the naive vocab agg is
    * corpus-scale.
    */
  def heavyHitters(df: DataFrame, tokenCol: String, threshold: Long,
                   depth: Int = 4, width: Int = 8192): DataFrame = {
    val sk = countMin(df.select(col(tokenCol)), tokenCol, lit(1L), depth, width)
      .collect() // bounded driver collect: ≤ depth × width rows
    val arr = Array.ofDim[Long](depth * width)
    sk.foreach(r => arr(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
    // native codegen'd lookup — a transform/element_at/array_min pipeline
    // here is CodegenFallback (higher-order fns), i.e. interpreted per
    // TOKEN OCCURRENCE of the corpus with a per-row struct-array alloc
    val est = org.apache.spark.sql.GraftBridge.column(
      graft.functions.CmsEstimate(org.apache.spark.sql.GraftBridge
        .expression(col(tokenCol)), arr, depth, width))
    df.select(col(tokenCol))
      .where(est >= threshold)
      .groupBy(tokenCol).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }

  /** Point estimates for `queries(tokenCol)`: min over the depth rows of
    * the matching counters (absent counter = 0 — the token was never
    * seen). The sketch side broadcasts (bounded); per query this is
    * `depth` slim lookups and one min.
    */
  def estimate(sketch: DataFrame, queries: DataFrame, tokenCol: String,
               depth: Int = 4, width: Int = 8192): DataFrame = {
    val pairs = queries
      .withColumn("p", explode(hashPairs(col(tokenCol), depth, width)))
      .select(queries.columns.map(col) :+ col("p.row").as("row") :+ col("p.bucket").as("bucket"): _*)
    pairs
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(queries.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
