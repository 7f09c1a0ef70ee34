package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def driftMap(rows: Seq[(String, Boolean)]): Map[String, BigDecimal] =
    Drift.categoricalDrift(rows.toDF("f", "a"), col("f"), col("a"))
      .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(3))).toMap

  test("identical slice distributions drift zero in every category") {
    // A = 2x each of x,y ; B = 4x each of x,y — same proportions
    val rows = Seq.fill(2)(Seq(("x", true), ("y", true))).flatten ++
      Seq.fill(4)(Seq(("x", false), ("y", false))).flatten
    assert(driftMap(rows).values.forall(_ == 0))
  }

  test("a planted shift shows up in exactly the shifted categories, exactly") {
    // A: 3 x, 1 y (A=4); B: 1 x, 3 y (B=4)
    val rows = Seq(("x", true), ("x", true), ("x", true), ("y", true),
      ("x", false), ("y", false), ("y", false), ("y", false))
    val d = driftMap(rows)
    // |3*4 - 1*4| = 8 for both categories
    assert(d("x") == 8 && d("y") == 8)
  }

  test("drift numerators are partitioning-invariant integers") {
    val rows = (1 to 200).map(i => (s"c${i % 7}", i % 3 == 0))
    val a = driftMap(rows)
    val b = Drift.categoricalDrift(rows.toDF("f", "a").repartition(9), col("f"), col("a"))
      .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(3))).toMap
    assert(a == b)
  }
}
