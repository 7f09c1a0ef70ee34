package graft.functions

import graft.ops.{Pii, TextAnalysis}
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL names for the corpus/training-data operators, so YAML pipeline
  * transforms can call them in `projection:`/`filter:` expressions exactly
  * like the reference's built-in function library (§2.4) — e.g.
  *
  * {{{
  * transform:
  *   - source-table: corpus.documents
  *     projection: "doc_id, LANG_ID(text) AS lang, PII_REDACT(text) AS text"
  *     filter: "TOKEN_COUNT(text) >= 10 AND REP_RATIO(text) < 0.5"
  * }}}
  *
  * Each name maps to the same Column-expression tree the Scala API builds
  * (pure Catalyst — codegen'd, no UDF), via a FunctionBuilder.
  */
object CorpusFunctions {

  private def c(e: Expression) = GraftBridge.column(e)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String)(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      reg.createOrReplaceTempFunction(name,
        (args: Seq[Expression]) => GraftBridge.convertedExpression(f(c(args.head))), "built-in")

    one("LANG_ID")(TextAnalysis.langId)
    one("CLEAN_TEXT")(TextAnalysis.cleanText(_))
    one("TOKEN_COUNT")(TextAnalysis.tokenCount)
    one("SUBWORD_COUNT")(TextAnalysis.subwordCount)
    one("FINGERPRINT")(TextAnalysis.fingerprint)
    one("REP_RATIO")(TextAnalysis.repetitionRatio)
    one("PII_REDACT")(Pii.redact)
    one("PII_COUNT")(Pii.piiCount)
    // the Gopher repetition rules (ops/Repetition): stats array for
    // projections, fused default-threshold keep for filters
    one("REP_STATS")(CdcExpressions.repetitionStats)
    one("REP_KEEP")(graft.ops.Repetition.keepColumn)
    // the Gopher word/line rules at default thresholds; HASH64 for
    // deterministic bucketing/sampling expressions in YAML;
    // CHAR_BITMAP64 for content-similarity prefilters (the fuzzy-join
    // lower bound: bit_count(a ^ b) <= 2*maxDist)
    one("GOPHER_KEEP")(TextAnalysis.gopherKeep(_))
    one("HASH64")(CdcExpressions.hash64)
    one("CHAR_BITMAP64")(CdcExpressions.charBitmap64)
  }
}
