package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class ChatFormatSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 10L, "user", "hello"),
    (1L, 20L, "assistant", "hi there"),
    (1L, 30L, "user", "bye"),
    (1L, 40L, "assistant", "later"),
    (2L, 5L, "user", "solo")
  ).toDF("conv", "ix", "role", "content")

  private def rendered = ChatFormat.render(turns, "conv", "ix", "role", "content")
    .collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getSeq[Row](2).map(s => (s.getLong(0), s.getLong(1)))))
    .toMap

  test("renders ChatML pieces in turn order with hand-computed spans") {
    val (text, spans) = rendered(1L)
    assert(text ==
      "<|user|>hello<|end|><|assistant|>hi there<|end|>" +
      "<|user|>bye<|end|><|assistant|>later<|end|>")
    // spans cover exactly the assistant CONTENTS
    assert(spans.size == 2)
    spans.zip(Seq("hi there", "later")).foreach { case ((a, b), want) =>
      assert(text.substring(a.toInt, b.toInt) == want)
    }
    // no-assistant conversation -> empty span list, text still rendered
    val (t2, s2) = rendered(2L)
    assert(t2 == "<|user|>solo<|end|>" && s2.isEmpty)
  }

  test("rendering is partitioning-invariant") {
    val a = rendered
    val b = ChatFormat.render(turns.repartition(5), "conv", "ix", "role", "content")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getSeq[Row](2).map(s => (s.getLong(0), s.getLong(1)))))
      .toMap
    assert(a == b)
  }

  test("one exchange: the span window and the assembly share the conv partitioning") {
    val plan = ChatFormat.render(turns, "conv", "ix", "role", "content")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(2000))
  }
}
