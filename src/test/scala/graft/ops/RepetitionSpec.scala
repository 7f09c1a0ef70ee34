package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The within-document repetition metrics on crafted inputs: the synthetic
  * corpus has zero line/paragraph duplication, so the line/para rules are
  * proven here, not by the oracle queries.
  */
class RepetitionSpec extends SparkSpec {
  import Repetition._

  test("duplicate lines: fraction and char fraction") {
    // 4 non-blank lines, "spam" repeated 3x (2 dups); chars: spam=4
    // dup=2*4=8, tot=3*4+5=17
    val st = statsOf("spam\nspam\nspam\nhello")
    assert(st(DupLineFrac) == 2.0 / 4)
    assert(st(DupLineCharFrac) == 8.0 / 17)
  }

  test("blank and space-only lines never count; tab-only lines do (DuckDB trim parity)") {
    val st = statsOf("a\n\n   \na")
    assert(st(DupLineFrac) == 1.0 / 2) // lines: a, a
    val tabbed = statsOf("a\n\t\na")
    assert(tabbed(DupLineFrac) == 1.0 / 3) // lines: a, \t, a
  }

  test("duplicate paragraphs split on blank lines, not single newlines") {
    // paragraphs: "p one\np one" (internal newline, ONE para), "x", "x"
    val st = statsOf("p one\np one\n\nx\n\nx")
    assert(st(DupParaFrac) == 1.0 / 3)
    // but the identical LINES are line-dups: 4 lines, 2 distinct → 2 dups
    assert(st(DupLineFrac) == 2.0 / 4)
  }

  test("top bigram fraction over the [a-z]+ tokenization") {
    // 12 words → 11 bigrams: "the cat"×6, "cat the"×5 → max 6 of 11
    val st = statsOf("The cat; THE cat the cat the CAT the cat... the cat!")
    assert(st(TopBigramFrac) == 6.0 / 11)
    // below the evidence floor the metric reports 0, never 0.5
    assert(statsOf("The cat; THE cat... the!")(TopBigramFrac) == 0.0)
    assert(statsOf("oneword")(TopBigramFrac) == 0.0)
    assert(statsOf("")(TopBigramFrac) == 0.0)
  }

  test("duplicate 5-gram fraction counts occurrences of repeated grams") {
    // period-5 word sequence of length 15 → 11 5-gram windows, every gram
    // recurs at i+5 (phase 0 occurs 3×, phases 1-4 twice each) → frac 1.0
    val st = statsOf(Seq.fill(3)("one two three four five").mkString(" "))
    assert(st(DupNgramFrac) == 1.0)
    // below the evidence floor (9 words → 5 windows) → 0
    assert(statsOf("one two three four five one two three four")(DupNgramFrac) == 0.0)
  }

  test("empty and degenerate documents yield all-zero metrics") {
    assert(statsOf("").forall(_ == 0.0))
    assert(statsOf("   \n  \n\n ").forall(_ == 0.0))
  }

  test("keepOf applies every cap") {
    val spammy = "buy now\nbuy now\nbuy now\nbuy now"
    assert(!keepOf(spammy, MaxDupLineFrac, MaxDupLineCharFrac,
      MaxDupParaFrac, MaxDupParaCharFrac, MaxTopBigramFrac, MaxDupNgramFrac))
    val clean = "a quiet morning\n\nbirds over the harbor"
    assert(keepOf(clean, MaxDupLineFrac, MaxDupLineCharFrac,
      MaxDupParaFrac, MaxDupParaCharFrac, MaxTopBigramFrac, MaxDupNgramFrac))
  }

  test("expression path matches statsOf and the filter plan has no shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam\nspam\nspam\nhello"),
      (2L, "a quiet morning\n\nbirds over the harbor"),
      (3L, "")).toDF("doc_id", "text")
    val prof = Repetition.profile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val expect = Seq("spam\nspam\nspam\nhello",
      "a quiet morning\n\nbirds over the harbor", "")
    prof.zip(expect).foreach { case (row, text) =>
      val st = statsOf(text)
      assert(row.getDouble(1) == st(DupLineFrac), text)
      assert(row.getDouble(2) == st(DupLineCharFrac))
      assert(row.getDouble(3) == st(DupParaFrac))
      assert(row.getDouble(4) == st(DupParaCharFrac))
      assert(row.getDouble(5) == st(TopBigramFrac))
      assert(row.getDouble(6) == st(DupNgramFrac))
    }
    val filtered = Repetition.filter(docs, "text")
    assert(filtered.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("null text rows are dropped by the filter, null stats by profile") {
    import spark.implicits._
    val docs = Seq((1L, "fine text here"), (2L, null))
      .toDF("doc_id", "text")
    assert(Repetition.filter(docs, "text").count() == 1)
    val p = Repetition.profile(docs, "doc_id", "text")
      .where(col("doc_id") === 2).collect()
    assert(p.length == 1 && p(0).isNullAt(1))
  }
}
