package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)
  // anisotropic fixture: dim 0 dominates (sd 10), dim 1 next (sd 3), rest
  // noise (sd 0.5) — the spectrum a PCA must recover in order
  private val d = 8
  private val rows: Seq[(Long, Seq[Float])] = (0 until 400).map { i =>
    val sds = Array(10.0, 3.0) ++ Array.fill(d - 2)(0.5)
    (i.toLong, (0 until d).map(j => (rnd.nextGaussian() * sds(j) + j).toFloat).toSeq)
  }
  private lazy val df = rows.toDF("id", "vec")

  private def naiveCov(): Array[Array[Double]] = {
    val xs = rows.map(_._2.map(_.toDouble).toArray)
    val n = xs.size.toDouble
    val mean = (0 until d).map(j => xs.map(_(j)).sum / n)
    Array.tabulate(d, d)((a, b) =>
      xs.map(x => x(a) * x(b)).sum / n - mean(a) * mean(b))
  }

  test("jacobi recovers a known 2x2 spectrum exactly") {
    val (values, vectors) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(values.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val big = if (values(0) > values(1)) 0 else 1
    assert(math.abs(math.abs(vectors(0)(big)) - 1 / math.sqrt(2)) < 1e-12)
  }

  test("fit: orthonormal components satisfying Cv = lambda v, descending spectrum") {
    val model = Pca.fit(df, "vec", k = d)
    val comps = model.components
    for (a <- comps.indices; b <- comps.indices) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"($a,$b) dot=$dot")
    }
    assert(model.eigenvalues.toSeq === model.eigenvalues.sorted.reverse.toSeq)
    assert(model.eigenvalues.forall(_ > -1e-9))
    // eigen-pairs of the NAIVE covariance (independent recomputation from
    // the raw rows; the distributed suffstats never see this code)
    val cov = naiveCov()
    comps.zip(model.eigenvalues).foreach { case (v, lam) =>
      val cv = cov.map(row => row.zip(v).map { case (c, x) => c * x }.sum)
      val resid = cv.zip(v).map { case (a, b) => a - lam * b }
        .map(x => x * x).sum
      assert(math.sqrt(resid) < 1e-6, s"||Cv - lambda v|| = ${math.sqrt(resid)}")
    }
    // the dominant direction is dim 0 (sd 10 vs 3 vs 0.5)
    assert(math.abs(comps(0)(0)) > 0.99, comps(0).mkString(","))
    assert(math.abs(comps(1)(1)) > 0.98, comps(1).mkString(","))
  }

  test("transform equals manual centered projection; plans with no exchange") {
    val model = Pca.fit(df, "vec", k = 2)
    val out = Pca.transform(df, "vec", model)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(2000)) // narrow map only
    val got = out.select("id", "pca").as[(Long, Seq[Float])].collect().toMap
    rows.take(20).foreach { case (id, v) =>
      val centered = v.zip(model.mean).map { case (x, m) => x - m.toFloat }
      val want = model.components.map(c =>
        centered.zip(c).map { case (x, w) => x * w.toFloat }.sum)
      got(id).zip(want).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-3, s"id=$id got=${got(id)} want=${want.toSeq}")
      }
    }
  }

  test("variance report: shares increase to ~1 at k = d; head share dominates") {
    val rep = Pca.varianceReport(df, "vec", k = d)
      .orderBy("component").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val shares = rep.map(_._3)
    assert(shares.toSeq === shares.sorted.toSeq)
    assert(math.abs(shares.last - 1.0) < 1e-6) // all components = all variance
    assert(shares.head > 0.85) // sd-10 dim carries ~100/111 of the trace
  }

  test("fit refuses feature-matrix widths") {
    val wide = Seq((1L, Seq.fill(5000)(1.0f))).toDF("id", "vec")
    val err = intercept[IllegalArgumentException] { Pca.fit(wide, "vec", 2) }
    assert(err.getMessage.contains("embedding widths"))
  }
}
