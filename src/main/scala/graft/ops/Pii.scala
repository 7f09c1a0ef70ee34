package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for corpus cleaning — the scrub stage of a
  * training-data pipeline (absent from the reference, which moves rows
  * verbatim; prompt-mandated extension).
  *
  * Pure codegen'd `regexp_replace`/`regexp_count` projections: narrow, no
  * shuffle, scan-bound at 100 TB. Patterns are deliberately RE2-safe
  * (no backrefs/lookaround) so the same patterns run in DuckDB/RE2-based
  * engines for oracle parity.
  */
object Pii {

  /** (name, pattern, replacement) — extend per corpus. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // TPC-H style international phone: 25-989-741-2988
    ("phone", "\\d{2,3}[- .]\\d{3}[- .]\\d{3,4}[- .]\\d{4}", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Redact every configured PII pattern. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, pat, repl)) => regexp_replace(c, pat, repl) }

  /** Total count of PII matches across all patterns. */
  def piiCount(text: Column): Column =
    Patterns.map { case (_, pat, _) => regexp_count(text, lit(pat)) }
      .reduce(_ + _).cast("long")
}
