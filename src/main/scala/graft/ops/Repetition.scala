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
  * All five metrics are DOC-LOCAL, so the whole stage is one codegen'd
  * expression over the scan — no explode, no shuffle, no join. That is the
  * 100 TB shape: corpus-level dedup ([[Dedup]]) needs its shuffle;
  * repetition filtering never does.
  *
  * Metrics (all in [0,1], 0 for empty/degenerate docs):
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
    * all five — the fused hot path; see [[graft.ops.QualityModel]]).
    */
  val DupLineFrac = 0
  val DupLineCharFrac = 1
  val DupParaFrac = 2
  val DupParaCharFrac = 3
  val TopBigramFrac = 4

  /** Gopher §A1.1-shaped default thresholds (keep a doc iff every metric is
    * at or under its cap). The bigram cap is word-occurrence-based here
    * (the paper's is character-based), so the default is slightly looser.
    */
  val MaxDupLineFrac = 0.30
  val MaxDupLineCharFrac = 0.20
  val MaxDupParaFrac = 0.30
  val MaxDupParaCharFrac = 0.20
  val MaxTopBigramFrac = 0.20

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
    * evidence floor.
    */
  private def topBigramFrac(s: String): Double = {
    val m = WordRe.matcher(s.toLowerCase)
    val words = Seq.newBuilder[String]
    while (m.find()) words += m.group()
    val ws = words.result()
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

  /** All five metrics in one text pass — the static entry the codegen'd
    * REPETITION_STATS / REPETITION_KEEP expressions call.
    */
  def statsOf(s: String): Array[Double] = {
    val (dl, dlc) = dupStats(segments(s, "\n"))
    val (dp, dpc) = dupStats(segments(s, "\n\n"))
    Array(dl, dlc, dp, dpc, topBigramFrac(s))
  }

  def keepOf(s: String, maxDupLine: Double, maxDupLineChar: Double,
             maxDupPara: Double, maxDupParaChar: Double,
             maxTopBigram: Double): Boolean = {
    val st = statsOf(s)
    st(DupLineFrac) <= maxDupLine && st(DupLineCharFrac) <= maxDupLineChar &&
      st(DupParaFrac) <= maxDupPara && st(DupParaCharFrac) <= maxDupParaChar &&
      st(TopBigramFrac) <= maxTopBigram
  }

  /** Per-document metric columns. One expression evaluation per row: the
    * five projections read the SAME `REPETITION_STATS` call (whole-stage
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
      element_at(st, TopBigramFrac + 1).as("top_bigram_frac"))
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
             maxTopBigram: Double = MaxTopBigramFrac): DataFrame =
    df.where(CdcExpressions.repetitionKeep(col(textCol), maxDupLine,
      maxDupLineChar, maxDupPara, maxDupParaChar, maxTopBigram))

  /** Filter as a reusable Column predicate (for composing with other
    * quality gates in one scan).
    */
  def keepColumn(text: Column): Column =
    CdcExpressions.repetitionKeep(text, MaxDupLineFrac, MaxDupLineCharFrac,
      MaxDupParaFrac, MaxDupParaCharFrac, MaxTopBigramFrac)
}
