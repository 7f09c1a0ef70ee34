package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string join (entity resolution / record linkage): all pairs
  * within a Levenshtein edit-distance bound, found without the |L|·|R|
  * cross join — q-gram blocking (Gravano et al., "Approximate String
  * Joins in a Database (Almost) for Free", VLDB 2001) with the
  * PREFIX-FILTER candidate generation of the PPJoin family (Xiao et al.,
  * WWW 2008): strings within distance `d` share all but n·d of their
  * positional n-grams, so under ONE GLOBAL gram ordering (rarest first)
  * two qualifying strings must collide somewhere in their first n·d+1
  * grams. Each record therefore blocks on only its n·d+1 RAREST grams —
  * candidate volume is Σ(prefix-df)² over grams, and rare grams have
  * tiny df, where blocking on ALL grams is Σ df² (quadratic in every
  * template cluster; measured 10×+ slower on a templated corpus).
  *
  * Scale design: the gram relation carries (gram, id) ONLY — strings
  * never ride the blocking shuffles; the global df table is a map-side-
  * combined agg joined back on the same gram key; prefix selection is a
  * per-record WindowGroupLimit heap; the exact Levenshtein verify runs as
  * a narrow codegen projection over DISTINCT surviving pairs only, with
  * strings attached to survivors by id. The df-cap drops blocking grams
  * above it — the guard against a degenerate corpus where even a
  * record's rarest grams are boilerplate; as with [[Graph.coDupEdges]]'s
  * fingerprint cap, a pair ALL of whose shared grams are boilerplate is
  * invisible by design (documented recall trade, not silent).
  *
  * Exactness note: the prefix bound is proved for positional gram
  * multisets; this implementation blocks on DISTINCT grams (a string
  * with internal gram repeats has a slightly shorter distinct-gram list,
  * making its prefix marginally MORE selective). The exact verify keeps
  * precision at 100% regardless; `FuzzyJoinSpec`'s brute-force parity
  * checks recall against the same reference pipeline.
  */
object FuzzyJoin {

  /** Self-join `df` on `strCol`: pairs (id_a < id_b) with
    * `levenshtein ≤ maxDist`, their distance attached. Records shorter
    * than `n` characters have no grams and never pair.
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       n: Int = 3, maxDist: Int = 2,
                       dfCap: Int = Int.MaxValue): DataFrame = {
    val prefixLen = n * maxDist + 1
    val strs = df
      .select(col(idCol).cast("long").as("__id"), col(strCol).as("__s"))
      .where(length(col("__s")) >= n)
    val grams = strs.withColumn("gram", explode(expr(
        s"array_distinct(transform(sequence(1, length(__s) - ${n - 1}), " +
          s"i -> substring(__s, i, $n)))")))
      .select(col("gram"), col("__id"))
    val gdf = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= dfCap)
    // per-record prefix: the n·d+1 rarest grams under the (df, gram)
    // global order — a WindowGroupLimit heap per id, slim rows only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy(col("__df"), col("gram"))
    // MATERIALIZED: the prefix relation is prefixLen slim rows per record
    // and feeds BOTH sides of the self-join plus the pair stage —
    // re-deriving it through the scan+explode+window lineage per
    // consumer measured 4× slower than materializing once (the Bpe-vocab
    // localCheckpoint pattern; at deployment scale this is the persisted
    // blocking-key table)
    val prefix = grams.join(gdf, "gram")
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= prefixLen)
      .select(col("gram"), col("__id"))
      .localCheckpoint()
    prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b")).distinct()
      // strings attach to DISTINCT candidates only (prefix-bounded), then
      // the exact DP verify runs as a narrow projection over them
      .join(strs.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(strs.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
