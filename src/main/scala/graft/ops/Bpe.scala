package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction (Sennrich et al. 2016) — the
  * distributed half of training a tokenizer on a pretraining corpus.
  *
  * Scale design — the trick every real BPE trainer uses (and the reason
  * this scales): merges are learned over the WORD-FREQUENCY TABLE, never
  * the corpus. The corpus is scanned exactly ONCE ([[wordCounts]]: one
  * hash aggregation, map-side partials collapse repeated words before the
  * shuffle — bytes shuffled are bounded by the distinct-word vocabulary,
  * ~10^7 at web scale, not the 100 TB of text). Every Lloyd-style merge
  * iteration then runs on that bounded table: a codegen'd adjacent-pair
  * explode + one (pair)-bounded aggregation, an argmax of ONE row to the
  * driver, and a narrow fold expression applying the merge. Nothing in the
  * loop ever re-reads the corpus.
  *
  * Determinism: the argmax tie-break is (count desc, a, b) — lexicographic,
  * so training is reproducible across runs and partitionings (reference
  * BPE breaks ties by first-seen order, which is partitioning-dependent).
  */
object Bpe {

  /** One corpus scan → the word-frequency table (`word`, `freq`), the
    * pre-tokenization stage: lowercase, split on non-word runs.
    */
  def wordCounts(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(filter(split(lower(textCol), "\\W+"), x => x =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The vocab table seeded for merging: each word as its character-symbol
    * sequence (no end-of-word marker; a whole-word merge is simply the
    * final possible merge of its pair chain).
    */
  def seedVocab(wordCounts: DataFrame): DataFrame =
    wordCounts.select(col("word"), col("freq"),
      filter(split(col("word"), ""), s => s =!= "").as("syms"))

  /** Frequency-weighted adjacent-pair counts over the vocab's current
    * symbol sequences — the per-iteration statistic. Pair explode is a
    * codegen'd `transform(sequence(...))`; the aggregation is bounded by
    * the number of DISTINCT adjacent pairs (≤ alphabet² early, shrinking
    * as merges fuse), with map-side partials.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i + 1] AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Apply ONE merge (a, b) → ab to every symbol sequence: a left-to-right
    * fold (`aggregate`), so overlapping occurrences merge greedily the way
    * reference BPE does ("aaa" under (a,a) → [aa, a]); a freshly-merged
    * symbol immediately participates in the next comparison. Narrow,
    * codegen'd, no shuffle.
    */
  def mergeExpr(a: String, b: String): Column = {
    val (qa, qb) = (lit(a), lit(b))
    aggregate(col("syms"), array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 && element_at(acc, -1) === qa && s === qb,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(qa, qb))))
        .otherwise(concat(acc, array(s))))
  }

  /** Learn `numMerges` merges; returns (ordered merge list, final vocab —
    * each word's learned subword split, the broadcastable encode table).
    *
    * Each iteration materializes the merged vocab (persist + count) and
    * drops the previous one: the loop's lineage stays one merge deep, the
    * same discipline as Lloyd iterations in [[Ivf.train]]. Stops early
    * when no pair occurs twice (merging singletons is memorization).
    */
  def trainMerges(df: DataFrame, textCol: Column, numMerges: Int):
      (Seq[(String, String)], DataFrame) = {
    // Deliberate driver loop: ONE bounded Spark job per merge. A caller
    // (or a YAML pipeline) passing a production vocab size (50k–100k)
    // would schedule that many sequential jobs — hours of scheduler
    // overhead, not computation. Beyond this cap the right tool is the
    // classic in-memory trainer over the COLLECTED word-frequency table
    // (bounded by distinct words, ~10^7 rows — driver-sized), with this
    // distributed loop reserved for the corpus-scan + early-merge regime
    // it is designed for.
    require(numMerges <= 4096,
      s"numMerges=$numMerges exceeds the 4096-job cap: collect wordCounts() " +
        "and train large vocabs in memory instead")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var vocab = seedVocab(wordCounts(df, textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = vocab.withColumn("syms", mergeExpr(a, b))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        vocab.unpersist()
        vocab = next
      }
      i += 1
    }
    (merges.toSeq, vocab)
  }

  /** Tokenize a corpus with a trained vocab: words join the (bounded)
    * encode table — the corpus is never re-segmented symbol by symbol.
    * Out-of-vocab words fall back to character symbols (the seed state:
    * training saw every corpus word, so this only fires on NEW text).
    */
  def encode(df: DataFrame, idCol: String, textCol: Column, vocab: DataFrame): DataFrame =
    df.select(col(idCol),
        posexplode(filter(split(lower(textCol), "\\W+"), x => x =!= ""))
          .as(Seq("word_ix", "word")))
      .join(broadcast(vocab.select(col("word"), col("syms"))), Seq("word"), "left")
      .select(col(idCol), col("word_ix"), col("word"),
        coalesce(col("syms"), filter(split(col("word"), ""), s => s =!= "")).as("tokens"))
}
