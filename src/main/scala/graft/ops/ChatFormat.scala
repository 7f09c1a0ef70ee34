package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chat-template rendering for SFT/post-training data prep: turn rows
  * (conv, turn_ix, role, content) become one packed training string per
  * conversation plus the CHARACTER SPANS of the completion turns — the
  * loss mask. Every serious post-training pipeline needs exactly this pair
  * (render once, mask by span), and getting the offsets right under
  * distribution is the whole trick: each turn's start offset is a prefix
  * sum of rendered-piece lengths in turn order.
  *
  * Scale shape: ONE shuffle. The prefix sum runs as a window over
  * (conv, turn order) and the final per-conv assembly groups on the SAME
  * key, so the exchange is reused — no second shuffle, no driver state,
  * conversations of any count. Pieces concatenate in pinned turn order
  * (`array_sort` on (ix, piece) structs), so the rendered string and every
  * span are deterministic under any partitioning. Offsets are UTF-16 char
  * units (= codepoints for BMP text; the fixtures are ASCII — the
  * `g_fnv64` stance).
  *
  * The reference has no chat operator; the template shape follows the
  * public ChatML convention (`<|role|>content<|end|>`).
  */
object ChatFormat {

  /** Rendered piece for one turn: `<|role|>content<|end|>`. */
  private def piece(role: Column, content: Column): Column =
    concat(lit("<|"), role, lit("|>"), content, lit("<|end|>"))

  /** Per-conversation packed text + completion spans.
    *
    * Output: (convCol, text, spans) where `spans` is an array of
    * (start, end) structs — half-open char offsets of each
    * `maskRole` turn's CONTENT (template tokens excluded, the standard
    * loss-mask convention).
    */
  def render(turns: DataFrame, convCol: String, ixCol: String,
             roleCol: String, contentCol: String,
             maskRole: String = "assistant"): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(ixCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOffsets = turns
      .select(col(convCol), col(ixCol), col(roleCol),
        piece(col(roleCol), col(contentCol)).as("piece"),
        // content starts after "<|" + role + "|>" (role_len + 4 chars)
        (length(col(roleCol)) + lit(4)).as("head_len"),
        length(col(contentCol)).as("content_len"))
      .withColumn("cum_end", sum(length(col("piece"))).over(w))
      .withColumn("start", col("cum_end") - length(col("piece")))
    withOffsets
      .groupBy(col(convCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col(ixCol).as("ix"), col("piece")))),
          f => f("piece")), "").as("text"),
        array_sort(collect_list(
          when(col(roleCol) === maskRole,
            struct((col("start") + col("head_len")).as("start"),
              (col("start") + col("head_len") + col("content_len")).as("end")))))
          .as("spans"))
  }
}
