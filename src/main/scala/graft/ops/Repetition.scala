package graft.ops

import graft.functions.CdcExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-document repetition metrics and the repetition quality filter —
  * the Gopher-rule family (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", §A1.1): a document
  * whose own lines/paragraphs/n-grams repeat is boilerplate- or
  * spam-shaped and is dropped before pre-training regardless of its
  * corpus-level dedup status.
  *
  * All six metrics are DOC-LOCAL, so the whole stage is one codegen'd
  * expression over the scan — no explode, no shuffle, no join. That is the
  * 100 TB shape: corpus-level dedup ([[Dedup]]) needs its shuffle;
  * repetition filtering never does.
  *
  * Metrics (all in [0,1], 0 for empty/degenerate docs):
  *  - `dup_5gram_frac`    — fraction of word-5-gram occurrences belonging
  *    to grams appearing twice or more (the duplicate-n-gram rule)
  *  - `dup_line_frac`     — fraction of non-blank lines that repeat an
  *    earlier identical line
  *  - `dup_line_char_frac` — fraction of characters sitting in those
  *    repeated occurrences
  *  - `dup_para_frac`     — same, over `\n\n`-separated paragraphs
  *  - `dup_para_char_frac`
  *  - `top_bigram_frac`   — occurrences of the most frequent word bigram
  *    over all bigram occurrences (the "top 2-gram fraction" rule;
  *    tokenization is the corpus-wide `[a-z]+` on lowercased text, the
  *    same as [[TextAnalysis.docTokens]], so the DuckDB oracle replays it
  *    with the identical regex)
  */
object Repetition {

  /** Index layout of the stats array (single expression evaluation returns
    * all six — the fused hot path; see [[graft.ops.QualityModel]]).
    */
  val DupLineFrac = 0
  val DupLineCharFrac = 1
  val DupParaFrac = 2
  val DupParaCharFrac = 3
  val TopBigramFrac = 4
  val DupNgramFrac = 5

  /** Gopher §A1.1-shaped default thresholds (keep a doc iff every metric is
    * at or under its cap). The bigram cap is word-occurrence-based here
    * (the paper's is character-based), so the default is slightly looser.
    */
  val MaxDupLineFrac = 0.30
  val MaxDupLineCharFrac = 0.20
  val MaxDupParaFrac = 0.30
  val MaxDupParaCharFrac = 0.20
  val MaxTopBigramFrac = 0.20
  val MaxDupNgramFrac = 0.15

  /** The n of the duplicate-n-gram rule (Gopher covers n = 5..10 with
    * per-n thresholds; 5 is the strictest and subsumes most of the
    * signal — a repeated 10-gram contains repeated 5-grams).
    */
  val DupNgramN = 5

  /** Split on EVERY occurrence of `sep`, keeping empty tokens — DuckDB
    * `string_split` semantics, unlike `String.split`'s trailing-empty
    * dropping — then keep tokens with any non-space char (DuckDB
    * `trim(x) <> ''`, which strips spaces only).
    */
  private def segments(s: String, sep: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var from = 0
    var i = s.indexOf(sep)
    while (i >= 0) {
      out += s.substring(from, i)
      from = i + sep.length
      i = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.result().filter(_.exists(_ != ' '))
  }

  /** (dupFrac, dupCharFrac) of a segment list. Char counts are code points
    * (DuckDB `length` semantics), not UTF-16 units.
    */
  private def dupStats(segs: Seq[String]): (Double, Double) = {
    if (segs.isEmpty) return (0.0, 0.0)
    val counts = new java.util.HashMap[String, Int]()
    segs.foreach(l => counts.merge(l, 1, Integer.sum))
    var dups = 0L; var dupChars = 0L; var totChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val len = e.getKey.codePointCount(0, e.getKey.length).toLong
      val c = e.getValue.toLong
      dups += c - 1
      dupChars += (c - 1) * len
      totChars += c * len
    }
    (dups.toDouble / segs.size,
      if (totChars == 0) 0.0 else dupChars.toDouble / totChars)
  }

  private val WordRe = java.util.regex.Pattern.compile("[a-z]+")

  /** A tiny document's top-bigram ratio is degenerately high (2 bigrams →
    * max ≥ 0.5): below this many bigram occurrences the metric carries no
    * repetition evidence and reports 0 — insufficient evidence must not
    * drop a document (the same stance as [[QualityModel.logits]] dropping
    * no-feature docs from SCORING, inverted for a FILTER).
    */
  val MinBigramEvidence = 10

  /** max-bigram occurrences / total bigram occurrences; 0 under the
    * evidence floor. One tokenization shared with [[dupNgramFrac]].
    */
  private def topBigramFrac(ws: IndexedSeq[String]): Double = {
    if (ws.size - 1 < MinBigramEvidence) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    var max = 0
    while (i < ws.size - 1) {
      val c = counts.merge(ws(i) + " " + ws(i + 1), 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    max.toDouble / (ws.size - 1)
  }

  /** Fraction of n-gram occurrences belonging to grams that occur twice or
    * more; 0 under the evidence floor. Occurrence-based (the paper's is
    * char-coverage with interval union — occurrence fraction is the
    * SQL-replayable monotone equivalent at fixed n).
    */
  private def dupNgramFrac(ws: IndexedSeq[String], n: Int): Double = {
    val total = ws.size - n + 1
    if (total < MinBigramEvidence) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < total) {
      counts.merge(ws.slice(i, i + n).mkString(" "), 1, Integer.sum); ()
      i += 1
    }
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c >= 2) dup += c }
    dup.toDouble / total
  }

  private def tokens(s: String): IndexedSeq[String] = {
    val m = WordRe.matcher(s.toLowerCase)
    val words = IndexedSeq.newBuilder[String]
    while (m.find()) words += m.group()
    words.result()
  }

  /** All six metrics in one text pass (one tokenization) — the static entry
    * the codegen'd REPETITION_STATS / REPETITION_KEEP expressions call.
    */
  def statsOf(s: String): Array[Double] = {
    val (dl, dlc) = dupStats(segments(s, "\n"))
    val (dp, dpc) = dupStats(segments(s, "\n\n"))
    val ws = tokens(s)
    Array(dl, dlc, dp, dpc, topBigramFrac(ws), dupNgramFrac(ws, DupNgramN))
  }

  def keepOf(s: String, maxDupLine: Double, maxDupLineChar: Double,
             maxDupPara: Double, maxDupParaChar: Double,
             maxTopBigram: Double, maxDupNgram: Double): Boolean = {
    val st = statsOf(s)
    st(DupLineFrac) <= maxDupLine && st(DupLineCharFrac) <= maxDupLineChar &&
      st(DupParaFrac) <= maxDupPara && st(DupParaCharFrac) <= maxDupParaChar &&
      st(TopBigramFrac) <= maxTopBigram && st(DupNgramFrac) <= maxDupNgram
  }

  /** Per-document metric columns. One expression evaluation per row: the
    * six projections read the SAME `REPETITION_STATS` call (whole-stage
    * codegen subexpression elimination collapses the shared subtree inside
    * a single Project).
    */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = CdcExpressions.repetitionStats(col(textCol))
    df.select(col(idCol),
      element_at(st, DupLineFrac + 1).as("dup_line_frac"),
      element_at(st, DupLineCharFrac + 1).as("dup_line_char_frac"),
      element_at(st, DupParaFrac + 1).as("dup_para_frac"),
      element_at(st, DupParaCharFrac + 1).as("dup_para_char_frac"),
      element_at(st, TopBigramFrac + 1).as("top_bigram_frac"),
      element_at(st, DupNgramFrac + 1).as("dup_5gram_frac"))
  }

  /** Keep documents under every repetition cap — the curation filter.
    * Decides inside ONE codegen'd boolean expression over the scan (zero
    * shuffle; the five metrics are never materialized).
    */
  def filter(df: DataFrame, textCol: String,
             maxDupLine: Double = MaxDupLineFrac,
             maxDupLineChar: Double = MaxDupLineCharFrac,
             maxDupPara: Double = MaxDupParaFrac,
             maxDupParaChar: Double = MaxDupParaCharFrac,
             maxTopBigram: Double = MaxTopBigramFrac,
             maxDupNgram: Double = MaxDupNgramFrac): DataFrame =
    df.where(CdcExpressions.repetitionKeep(col(textCol), maxDupLine,
      maxDupLineChar, maxDupPara, maxDupParaChar, maxTopBigram, maxDupNgram))

  /** Filter as a reusable Column predicate (for composing with other
    * quality gates in one scan).
    */
  def keepColumn(text: Column): Column =
    CdcExpressions.repetitionKeep(text, MaxDupLineFrac, MaxDupLineCharFrac,
      MaxDupParaFrac, MaxDupParaCharFrac, MaxTopBigramFrac, MaxDupNgramFrac)
}
