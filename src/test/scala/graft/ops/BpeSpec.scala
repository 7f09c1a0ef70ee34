package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE induction vs a naive single-node reimplementation (the
  * RepetitionPropertySpec pattern: the distributed operator must equal the
  * obviously-correct sequential algorithm on every input).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: word counts in a Map, pair counts by loop, argmax with
    * (count desc, a, b) tie-break, left-to-right greedy merge.
    */
  private def naiveBpe(texts: Seq[String], numMerges: Int):
      (Seq[(String, String)], Map[String, Seq[String]]) = {
    val words = texts.flatMap(_.toLowerCase.split("\\W+")).filter(_.nonEmpty)
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[String, Seq[String]] =
      freq.keys.map(w => w -> w.split("").filter(_.nonEmpty).toSeq).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var it = 0
    while (it < numMerges && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        pc((a, b)) = pc.getOrElse((a, b), 0L) + freq(w)
      val best = pc.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          merges += ((a, b))
          vocab = vocab.map { case (w, syms) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { s =>
              if (out.nonEmpty && out.last == a && s == b)
                out(out.length - 1) = a + b
              else out += s
            }
            w -> out.toSeq
          }
        case _ => done = true
      }
      it += 1
    }
    (merges.toSeq, vocab)
  }

  test("trainMerges equals the naive reference on a crafted corpus") {
    val texts = Seq(
      "low lower lowest low low",
      "newer newest new low",
      "wider wide wider widest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val (gotMerges, gotVocab) = Bpe.trainMerges(df, col("text"), numMerges = 8)
    val (expMerges, expVocab) = naiveBpe(texts, numMerges = 8)
    assert(gotMerges === expMerges)
    val vocabMap = gotVocab.select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(vocabMap === expVocab)
  }

  test("trainMerges is invariant under repartitioning") {
    val texts = Seq("aa ab aa ab ba", "ab aa ba ba bb", "aa bb ab ab aa")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val (m1, _) = Bpe.trainMerges(df, col("text"), 5)
    val (m2, _) = Bpe.trainMerges(df.repartition(7), col("text"), 5)
    assert(m1 === m2)
    assert(m1.nonEmpty)
  }

  test("mergeExpr merges overlapping runs greedily left-to-right") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("b", "a", "a"))
      .toDF("syms")
    val out = df.select(Bpe.mergeExpr("a", "a").as("m")).as[Seq[String]].collect().toSeq
    assert(out === Seq(Seq("aa", "a"), Seq("aa", "aa"), Seq("b", "aa")))
    // a merged symbol participates in the NEXT round, not this one
    val out2 = df.select(Bpe.mergeExpr("a", "a").as("syms"))
      .select(Bpe.mergeExpr("aa", "a").as("m")).as[Seq[String]].collect().toSeq
    assert(out2.head === Seq("aaa"))
  }

  test("trainMerges stops early when no pair repeats; encode falls back on OOV") {
    val df = Seq((1L, "xy zq")).toDF("id", "text") // every pair count = 1
    val (merges, vocab) = Bpe.trainMerges(df, col("text"), 10)
    assert(merges.isEmpty)
    // encode: in-vocab word uses the trained split, OOV word falls back to chars
    val enc = Bpe.encode(Seq((9L, "xy unseen")).toDF("id", "text"), "id", col("text"), vocab)
      .orderBy("word_ix").select("word", "tokens").as[(String, Seq[String])].collect().toSeq
    assert(enc === Seq(("xy", Seq("x", "y")), ("unseen", Seq("u", "n", "s", "e", "e", "n"))))
  }

  test("a production-vocab merge count routes to the in-memory tier (job-storm guard)") {
    // beyond the 4096-round cap the trainer collects the word-frequency
    // table and trains in memory instead of refusing — transparently: the
    // naive reference must still match through the routed path
    val texts = Seq("low lower lowest low low", "newer newest new low")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val (gotMerges, gotVocab) = Bpe.trainMerges(df, col("text"), numMerges = 50000)
    val (expMerges, expVocab) = naiveBpe(texts, numMerges = 50000)
    assert(gotMerges === expMerges)
    assert(gotMerges.nonEmpty) // the tiny corpus exhausts, but not at zero
    val vocabMap = gotVocab.select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(vocabMap === expVocab)
  }

  test("the in-memory tier equals the distributed loop and the naive reference") {
    // same adversarial-corpus recipe as the batched-equality test: runs,
    // shared symbols, same-concatenation merge paths — the heap's
    // lazy-deletion and the incremental pair deltas must reproduce the
    // recount-from-scratch sequence bit-exactly, including pairs REVIVED
    // by made-symbol collisions
    val rng = new scala.util.Random(20260815L)
    for (trial <- 0 until 12) {
      val alphabet = Seq("a", "b", "c").take(2 + trial % 2)
      val words = Seq.fill(30) {
        (0 until (1 + rng.nextInt(6))).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString
      }
      val texts = Seq.fill(8)(Seq.fill(12)(words(rng.nextInt(words.size))).mkString(" "))
      val budget = 3 + rng.nextInt(10)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val wf = Bpe.wordCounts(df, col("text")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      val (memMerges, memRows) = Bpe.trainMergesInMemory(wf, budget)
      val (expMerges, expVocab) = naiveBpe(texts, budget)
      assert(memMerges === expMerges, s"in-memory merge sequence diverged (trial $trial)")
      assert(memRows.map(r => r._1 -> r._3).toMap === expVocab,
        s"in-memory final vocab diverged (trial $trial)")
    }
  }

  test("in-memory tie-breaks compare code points, not UTF-16 units") {
    // U+10000 (LINEAR B SYLLABLE, surrogate pair in UTF-16) sorts ABOVE
    // U+FFFD in code-point order but BELOW it in raw char order — the
    // in-memory argmax must match Spark's UTF8String binary order
    assert(Bpe.cmpSym("�", new String(Character.toChars(0x10000))) < 0)
    assert(Bpe.cmpSym("a", "ab") < 0) // prefix sorts first
    assert(Bpe.cmpSym("b", "ab") > 0)
  }

  test("batched trainMerges equals the naive reference on adversarial random corpora") {
    // Small alphabets force the hazards the batch guard exists for: runs
    // ("aaaa" — self-pairs), shared symbols between top pairs, and merge
    // paths that CONCATENATE to the same string from different splits
    // ((a,bc) vs (ab,c) → "abc" conflation). Equality must be bit-exact on
    // merges AND the final vocab, every corpus, every merge budget.
    val rng = new scala.util.Random(20260815L)
    for (trial <- 0 until 12) {
      val alphabet = Seq("a", "b", "c").take(2 + trial % 2)
      val words = Seq.fill(30) {
        (0 until (1 + rng.nextInt(6))).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString
      }
      val texts = Seq.fill(8)(Seq.fill(12)(words(rng.nextInt(words.size))).mkString(" "))
      val budget = 3 + rng.nextInt(10)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val (gotMerges, gotVocab) = Bpe.trainMerges(df, col("text"), budget)
      val (expMerges, expVocab) = naiveBpe(texts, budget)
      assert(gotMerges === expMerges, s"merge sequence diverged (trial $trial)")
      val vocabMap = gotVocab.select("word", "syms").as[(String, Seq[String])].collect().toMap
      assert(vocabMap === expVocab, s"final vocab diverged (trial $trial)")
      gotVocab.unpersist()
    }
  }

  test("selectBatch: prefix, disjointness, self-pair, collision, and dominance rules") {
    val live: String => Boolean = Set("a", "b", "c", "d", "e", "f")
    // disjoint prefix extends; overlap stops it and sets the threshold
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 50L), ("c", "d", 40L), ("b", "e", 30L)),
      10, live, exhausted = true) === Seq(("a", "b"), ("c", "d")))
    // member at the stop threshold's cnt is truncated (strict dominance):
    // (c,d)=30 ties the stopped (b,e)=30 → only the head survives
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 50L), ("c", "d", 30L), ("b", "e", 30L)),
      10, live, exhausted = true) === Seq(("a", "b")))
    // self-pair head merges alone
    assert(Bpe.selectBatch(IndexedSeq(("a", "a", 50L), ("c", "d", 40L)),
      10, live, exhausted = true) === Seq(("a", "a")))
    // a later self-pair stops the batch
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 50L), ("c", "c", 40L), ("d", "e", 35L)),
      10, live, exhausted = true) === Seq(("a", "b")))
    // collision with an ever-live symbol stops the batch ("cd" pre-exists)
    val liveCd: String => Boolean = Set("a", "b", "c", "d", "cd")
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 50L), ("c", "d", 40L)),
      10, liveCd, exhausted = true) === Seq(("a", "b")))
    // two members concatenating to the same string: second stops the batch
    assert(Bpe.selectBatch(IndexedSeq(("a", "bc", 50L), ("ab", "c", 40L)),
      10, (s: String) => Set("a", "b", "c", "ab", "bc")(s), exhausted = true)
      === Seq(("a", "bc")))
    // budget stop sets the threshold from the first excluded pair
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 50L), ("c", "d", 40L), ("e", "f", 40L)),
      2, live, exhausted = true) === Seq(("a", "b")))
    // non-exhausted collect: unseen pairs can tie the last collected cnt,
    // so trailing members at that cnt are dropped
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 50L), ("c", "d", 40L)),
      10, live, exhausted = false) === Seq(("a", "b")))
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 50L), ("c", "d", 40L)),
      10, live, exhausted = true) === Seq(("a", "b"), ("c", "d")))
    // head below the repeat floor: no batch at all
    assert(Bpe.selectBatch(IndexedSeq(("a", "b", 1L)), 10, live, exhausted = true) === Nil)
  }
}
