package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction (Sennrich et al. 2016) — the
  * distributed half of training a tokenizer on a pretraining corpus.
  *
  * Scale design — the trick every real BPE trainer uses (and the reason
  * this scales): merges are learned over the WORD-FREQUENCY TABLE, never
  * the corpus. The corpus is scanned exactly ONCE ([[wordCounts]]: one
  * hash aggregation, map-side partials collapse repeated words before the
  * shuffle — bytes shuffled are bounded by the distinct-word vocabulary,
  * ~10^7 at web scale, not the 100 TB of text). Every training round then
  * runs on that bounded table: an adjacent-pair explode + one
  * (pair)-bounded aggregation, a driver-bounded top-of-rank collect, and
  * ONE narrow codegen'd rewrite ([[graft.functions.BpeMergePass]]) applying
  * the round's whole merge batch — a provably-independent prefix of the
  * rank order ([[selectBatch]]), so a round lands several merges for one
  * iteration's cost while staying bit-identical to sequential BPE. Nothing
  * in the loop ever re-reads the corpus.
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
    // (r19 measured: Spread.across(df) here reads 1.05-1.78x SLOWER —
    // multi-consumer callers like q_vocab_sketch re-execute the exchange
    // per subtree; the tokenize+partial-agg stage wins nothing back)
    df.select(explode(graft.functions.CdcExpressions.regexTokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The vocab table seeded for merging: each word as its character-symbol
    * sequence (no end-of-word marker; a whole-word merge is simply the
    * final possible merge of its pair chain).
    */
  def seedVocab(wordCounts: DataFrame): DataFrame =
    wordCounts.select(col("word"), col("freq"),
      filter(split(col("word"), ""), s => s =!= "").as("syms"))

  /** Frequency-weighted adjacent-pair counts over the vocab's current
    * symbol sequences — the per-round statistic. The pair explode is a
    * `transform(sequence(...))` higher-order function (CodegenFallback in
    * Spark — acceptable here because it runs over the BOUNDED vocab
    * table, never the corpus, unlike the scan-path idioms that got native
    * expressions); the aggregation is bounded by the number of DISTINCT
    * adjacent pairs (≤ alphabet² early, shrinking as merges fuse), with
    * map-side partials.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i + 1] AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Apply ONE merge (a, b) → ab to every symbol sequence: a greedy
    * left-to-right pass, the way reference BPE does ("aaa" under (a,a) →
    * [aa, a]); a freshly-merged symbol immediately participates in the next
    * comparison. Narrow, no shuffle — a native codegen'd expression
    * ([[graft.functions.BpeMergePass]]): the higher-order `aggregate` fold
    * this replaces is CodegenFallback in Spark and copies the accumulator
    * array per element (O(len²) interpreted, per word per merge).
    */
  def mergeExpr(a: String, b: String): Column = mergesExpr(Seq((a, b)))

  /** A round's merges applied in rank order as ONE narrow projection. */
  private def mergesExpr(batch: Seq[(String, String)]): Column =
    GraftBridge.column(graft.functions.BpeMergePass(
      GraftBridge.expression(col("syms")), batch))

  /** The longest PREFIX of the pair-rank order that sequential BPE would
    * provably pick unchanged — the batch one training round applies at once.
    *
    * Rank order is (cnt desc, a, b); `sorted` is the collected top of that
    * order (the COMPLETE table when `exhausted`). The batch extends while
    * each next candidate is provably still the argmax after all earlier
    * members are applied:
    *
    *  1. **Prefix**: nothing ranked above a member is skipped, so every
    *     non-member pair started (and stays) below the stop candidate —
    *     applying a merge (a,b) only changes counts of pairs containing a
    *     or b, and only DOWNWARD (pairs disjoint from {a,b} keep their
    *     adjacencies bit-exactly).
    *  2. **Disjoint components**: members share no symbol, so applying one
    *     member leaves every other member's count exactly unchanged.
    *  3. **No self-pairs beyond position 1**: merging (a,a) creates (aa,a)
    *     runs whose count derives from the member's OWN count, which the
    *     stop threshold does not bound. A self-pair head merges alone.
    *  4. **No made-symbol collisions**: if a member's concatenation a+b
    *     equals a symbol that ever existed (`liveSyms`: seed alphabet +
    *     every made symbol — a conservative superset) or another member's
    *     concatenation, counts of existing pairs could INCREASE by
    *     conflation. Such a candidate stops the batch (a colliding head
    *     merges alone — a 1-batch is sequential BPE by definition).
    *  5. **Strict dominance**: members are truncated to cnt strictly above
    *     the first non-member's cnt (`thr`). New pairs created by a member
    *     (x,ab)/(ab,y) inherit counts bounded by the overlapping originals
    *     (x,a)/(b,y) — non-members by rule 2, hence ≤ thr < every member.
    *
    * Under 1–5, after applying members 1..k−1 the rank-order argmax is
    * exactly member k, so the batched trainer's merge sequence (and final
    * vocab) is bit-identical to the one-merge-per-job sequential loop —
    * `BpeSpec` pins this against a naive reference on adversarial corpora.
    */
  private[ops] def selectBatch(sorted: IndexedSeq[(String, String, Long)], budget: Int,
      liveSyms: String => Boolean, exhausted: Boolean): Seq[(String, String)] = {
    if (sorted.isEmpty || sorted.head._3 < 2 || budget <= 0) return Nil
    val head = sorted.head
    if (head._1 == head._2 || liveSyms(head._1 + head._2))
      return Seq((head._1, head._2))
    val chosen = scala.collection.mutable.ArrayBuffer(head)
    val used = scala.collection.mutable.Set(head._1, head._2)
    val made = scala.collection.mutable.Set(head._1 + head._2)
    var stopIdx = -1
    var i = 1
    while (stopIdx < 0 && i < sorted.length && chosen.size < budget) {
      val t = sorted(i)
      val m = t._1 + t._2
      if (t._3 >= 2 && t._1 != t._2 && !used(t._1) && !used(t._2) &&
          !liveSyms(m) && !made(m)) {
        chosen += t; used += t._1; used += t._2; made += m; i += 1
      } else stopIdx = i
    }
    if (stopIdx < 0 && i < sorted.length) stopIdx = i // budget stop
    val thr: Long =
      if (stopIdx >= 0) sorted(stopIdx)._3
      else if (exhausted) 0L
      // collected prefix consumed without exhausting the table: unseen pairs
      // can tie the last collected cnt, so members must sit strictly above it
      else sorted.last._3
    (chosen.head +: chosen.tail.filter(_._3 > thr).toSeq)
      .map(t => (t._1, t._2))
  }

  /** Learn `numMerges` merges; returns (ordered merge list, final vocab —
    * each word's learned subword split, the broadcastable encode table).
    *
    * Runs in ROUNDS, not one job per merge: each round collects the top of
    * the pair-rank order (driver-bounded: ≤ max(64, 4×remaining) rows of
    * two small strings — the same vocab-bounded table the argmax already
    * aggregated), picks the provably-independent batch ([[selectBatch]] —
    * merge-sequence equality with the sequential loop is guaranteed, not
    * approximated), and applies the whole batch in ONE narrow codegen'd
    * rewrite. Early merges are dominated by disjoint frequent pairs, so a
    * round typically lands several merges for the price of one iteration's
    * two jobs. Each round materializes the merged vocab (persist + count)
    * and drops the previous one: lineage stays one round deep, the same
    * discipline as Lloyd iterations in [[Ivf.train]]. Stops early when no
    * pair occurs twice (merging singletons is memorization).
    */
  def trainMerges(df: DataFrame, textCol: Column, numMerges: Int):
      (Seq[(String, String)], DataFrame) = {
    // Deliberate driver loop: bounded Spark jobs per ROUND. A caller (or a
    // YAML pipeline) passing a production vocab size (50k–100k) would
    // schedule thousands of sequential rounds — hours of scheduler
    // overhead, not computation. Beyond this cap the right tool is the
    // classic in-memory trainer over the COLLECTED word-frequency table
    // (bounded by distinct words, ~10^7 rows — driver-sized), with this
    // distributed loop reserved for the corpus-scan + early-merge regime
    // it is designed for. The route is transparent: same merge sequence,
    // same vocab (BpeSpec pins both tiers against each other and against
    // the naive reference) — the corpus is still scanned exactly once.
    if (numMerges > 4096) {
      val spark = df.sparkSession
      val wf = wordCounts(df, textCol).collect().iterator
        .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      val (ms, rows) = trainMergesInMemory(wf, numMerges)
      import spark.implicits._
      return (ms,
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 500000))
          .toDF("word", "freq", "syms"))
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var vocab = seedVocab(wordCounts(df, textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Every symbol that has EVER been live: the seed alphabet (bounded by
    // the corpus's distinct characters — one tiny job, which also
    // materializes the seed cache) + each made symbol. The batch guard's
    // collision check uses this superset: conservative (can only shorten a
    // batch), never admits an unsafe member.
    val liveEver = scala.collection.mutable.Set.empty[String]
    liveEver ++= vocab.select(explode(col("syms")).as("s")).distinct()
      .collect().iterator.map(_.getString(0))
    // The round's rewrite is NOT eagerly materialized: the next round's
    // top-of-rank collect materializes it as a side effect, and only then
    // is the parent cache dropped — one job per round instead of two, with
    // every unpersist still happening strictly after its child is cached.
    var prev: Option[DataFrame] = None
    var done = false
    while (merges.size < numMerges && !done) {
      val budget = numMerges - merges.size
      val topK = math.max(64, 4 * budget)
      val rows = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(topK).collect()
      prev.foreach(_.unpersist())
      prev = None
      val sorted = rows.iterator
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toIndexedSeq
      val batch = selectBatch(sorted, budget, liveEver, exhausted = rows.length < topK)
      if (batch.isEmpty) done = true
      else {
        merges ++= batch
        liveEver ++= batch.iterator.map { case (a, b) => a + b }
        val next = vocab.withColumn("syms", mergesExpr(batch))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prev = Some(vocab)
        vocab = next
      }
    }
    // budget-exit leaves the last rewrite unmaterialized with its parent
    // still pending: pin it before dropping the parent, or the caller's
    // first action would recompute the whole merge chain from the corpus
    prev.foreach { p => vocab.count(); p.unpersist() }
    (merges.toSeq, vocab)
  }

  /** Code-point string comparison — matches Spark's `orderBy` on STRING
    * (UTF8String binary order == Unicode code-point order), NOT Java's
    * `String.compareTo` (UTF-16 code-unit order, which sorts supplementary
    * characters below U+E000). The two tie-break orders must be one order.
    */
  private[ops] def cmpSym(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** One merge (a,b)→ab over a symbol array — the exact write-pointer
    * semantics of [[graft.functions.BpeMergePass]] with a 1-merge batch
    * (the freshly written symbol participates in the next comparison:
    * "aaa" under (a,a) → [aa, a]). Returns the INPUT array unchanged when
    * nothing merged, so callers can skip delta work by reference equality.
    */
  private def mergeOnce(s: Array[String], a: String, b: String): Array[String] = {
    val n = s.length
    val cur = s.clone()
    var w = 0
    var r = 0
    while (r < n) {
      val t = cur(r)
      if (w > 0 && cur(w - 1) == a && t == b) cur(w - 1) = a + b
      else { cur(w) = t; w += 1 }
      r += 1
    }
    if (w == n) s else java.util.Arrays.copyOf(cur, w)
  }

  /** The classic single-node BPE trainer over a COLLECTED word-frequency
    * table — the production-vocab tier [[trainMerges]] routes to beyond
    * its 4096-round cap. Identical semantics to the distributed loop
    * (frequency-weighted OVERLAPPING adjacent-pair counts, argmax by
    * (cnt desc, a, b) in code-point order, [[mergeOnce]] application,
    * stop when no pair occurs twice), so the merge sequences and final
    * vocabs are bit-identical — BpeSpec pins both against each other and
    * against the naive reference.
    *
    * Heap-based incremental algorithm (the shape every real tokenizer
    * trainer uses): pair counts live in a hash map; a lazy-deletion max
    * heap orders candidates (stale entries are discarded when popped by
    * checking the authoritative count); each merge rewrites ONLY the words
    * that contain the pair (an inverted pair→words index, maintained as a
    * superset) and applies the count deltas incrementally. O(merges ×
    * touched-words) instead of O(merges × vocab) — 50k merges over a 10^7
    * word table is minutes on a driver, with the CORPUS scanned exactly
    * once by the distributed [[wordCounts]] feeder.
    *
    * Returns (ordered merges, final vocab rows (word, freq, syms)).
    */
  def trainMergesInMemory(wordFreqs: IndexedSeq[(String, Long)], numMerges: Int):
      (Seq[(String, String)], IndexedSeq[(String, Long, Seq[String])]) = {
    val nWords = wordFreqs.length
    val freqs = new Array[Long](nWords)
    val syms = new Array[Array[String]](nWords)
    var wi = 0
    while (wi < nWords) {
      freqs(wi) = wordFreqs(wi)._2
      syms(wi) = wordFreqs(wi)._1.split("").filter(_.nonEmpty)
      wi += 1
    }

    val counts = new java.util.HashMap[(String, String), Long]
    val where = new java.util.HashMap[(String, String), java.util.BitSet]
    def bump(p: (String, String), d: Long): Long = {
      val nc = counts.getOrDefault(p, 0L) + d
      if (nc <= 0L) { counts.remove(p); () } else { counts.put(p, nc); () }
      nc
    }
    wi = 0
    while (wi < nWords) {
      val s = syms(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        bump(p, freqs(wi))
        where.computeIfAbsent(p, _ => new java.util.BitSet).set(wi)
        i += 1
      }
      wi += 1
    }

    // max heap: cnt desc, then a asc, then b asc (code-point order)
    val ord = new Ordering[(Long, String, String)] {
      def compare(u: (Long, String, String), v: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(u._1, v._1)
        if (c != 0) c
        else {
          val ca = cmpSym(v._2, u._2)
          if (ca != 0) ca else cmpSym(v._3, u._3)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](ord)
    counts.forEach((p, c) => heap.enqueue((c, p._1, p._2)))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val delta = new java.util.HashMap[(String, String), Long]
    var done = false
    while (!done && merges.size < numMerges && heap.nonEmpty) {
      val (c, a, b) = heap.dequeue()
      val cur = counts.getOrDefault((a, b), 0L)
      if (c == cur) { // authoritative entry — stale ones just drop
        if (c < 2) done = true // merging singletons is memorization
        else {
          merges += ((a, b))
          // after this pass no (a,b) adjacency survives anywhere (ab can
          // equal neither a nor b), so the pair's index entry retires; a
          // made-symbol collision can revive the pair later through the
          // generic delta path below, exactly as sequential BPE would
          val ws = where.remove((a, b))
          if (ws != null) {
            var w = ws.nextSetBit(0)
            while (w >= 0) {
              val old = syms(w)
              val neu = mergeOnce(old, a, b)
              if (!(neu eq old)) { // stale index entries rewrite nothing
                delta.clear()
                val f = freqs(w)
                var i = 0
                while (i < old.length - 1) {
                  delta.merge((old(i), old(i + 1)), -f, java.lang.Long.sum(_, _))
                  i += 1
                }
                i = 0
                while (i < neu.length - 1) {
                  delta.merge((neu(i), neu(i + 1)), f, java.lang.Long.sum(_, _))
                  i += 1
                }
                syms(w) = neu
                delta.forEach { (p, d) =>
                  if (d != 0L) {
                    val nc = bump(p, d)
                    if (nc > 0L) heap.enqueue((nc, p._1, p._2))
                    if (d > 0L) {
                      where.computeIfAbsent(p, _ => new java.util.BitSet).set(w)
                      ()
                    }
                  }
                }
              }
              w = ws.nextSetBit(w + 1)
            }
          }
        }
      }
    }
    (merges.toSeq,
      (0 until nWords).map(i => (wordFreqs(i)._1, freqs(i), syms(i).toSeq)))
  }

  /** Tokenize a corpus with a trained vocab: words join the (bounded)
    * encode table — the corpus is never re-segmented symbol by symbol.
    * Out-of-vocab words fall back to character symbols (the seed state:
    * training saw every corpus word, so this only fires on NEW text).
    */
  def encode(df: DataFrame, idCol: String, textCol: Column, vocab: DataFrame): DataFrame =
    df.select(col(idCol),
        posexplode(graft.functions.CdcExpressions.regexTokens(textCol))
          .as(Seq("word_ix", "word")))
      .join(broadcast(vocab.select(col("word"), col("syms"))), Seq("word"), "left")
      .select(col(idCol), col("word_ix"), col("word"),
        coalesce(col("syms"), filter(split(col("word"), ""), s => s =!= "")).as("tokens"))
}
