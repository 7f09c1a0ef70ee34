package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None), (None, Some("a"))
  ).toDF("k", "s")

  test("summarize emits one stats row per column from a single pass") {
    val out = Profile.summarize(df, Seq("k", "s"), exact = true)
      .orderBy("column")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    assert(out === Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("approx mode returns plausible cardinalities") {
    val big = (0L until 5000L).toDF("k")
    val row = Profile.summarize(big, Seq("k")).head()
    val nd = row.getLong(3)
    assert(math.abs(nd - 5000.0) / 5000.0 < 0.15) // HLL++ default rsd 5% → ±3σ
  }
}
