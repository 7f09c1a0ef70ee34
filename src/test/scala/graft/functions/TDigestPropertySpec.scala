package graft.functions

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM invariants of the merging t-digest, against random inputs from
  * several distribution shapes — no Spark, no shared code with the
  * assertions (they recompute from the raw sample).
  */
class TDigestPropertySpec extends AnyFunSuite {

  private def digestOf(xs: Seq[Double], compression: Int = 100): (Array[Double], Array[Double]) = {
    val b = new TDigestBuf(compression)
    xs.foreach(b.add(_, 1.0))
    val bytes = b.serialize()
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = Array.fill(n)(bb.getDouble)
    val w = Array.fill(n)(bb.getDouble)
    (m, w)
  }

  /** Atom-aware rank error: est is exact when q lies anywhere inside
    * est's own cumulative span [F(est−), F(est)] — a distribution with a
    * point mass makes every quantile inside the atom report the atom, and
    * |F(est) − q| alone would miscount that as error.
    */
  private def rankError(xs: Seq[Double], est: Double, q: Double): Double = {
    val lo = xs.count(_ < est).toDouble / xs.size
    val hi = xs.count(_ <= est).toDouble / xs.size
    math.max(0.0, math.max(q - hi, lo - q))
  }

  private val rnd = new scala.util.Random(29)
  private val shapes: Seq[(String, Int => Seq[Double])] = Seq(
    ("uniform", n => Seq.fill(n)(rnd.nextDouble() * 1000)),
    ("exponential", n => Seq.fill(n)(-math.log(rnd.nextDouble()) * 50)),
    ("bimodal", n => Seq.fill(n)(
      if (rnd.nextBoolean()) rnd.nextGaussian() else 500 + rnd.nextGaussian())),
    ("integer-heavy", n => Seq.fill(n)((rnd.nextInt(40) * rnd.nextInt(40)).toDouble)))

  test("weight is conserved and centroids stay sorted inside [min, max]") {
    for ((name, gen) <- shapes; trial <- 1 to 3) {
      val xs = gen(5000 + trial * 1000)
      val (m, w) = digestOf(xs)
      assert(w.sum === xs.size.toDouble, s"$name: weight not conserved")
      assert(m.toSeq === m.sorted.toSeq, s"$name: centroids unsorted")
      assert(m.head >= xs.min && m.last <= xs.max, s"$name: means outside data range")
      assert(w.forall(_ > 0), name)
    }
  }

  test("quantiles are monotone in q and inside rank-error bands for every shape") {
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    for ((name, gen) <- shapes) {
      val xs = gen(8000)
      val (m, w) = digestOf(xs)
      val ests = qs.map(TDigest.quantile(m, w, _))
      assert(ests == ests.sorted, s"$name: non-monotone quantiles $ests")
      qs.zip(ests).foreach { case (q, est) =>
        val tol = if (q <= 0.1 || q >= 0.9) 0.015 else 0.03
        assert(rankError(xs, est, q) <= tol,
          s"$name q=$q est=$est err=${rankError(xs, est, q)}")
      }
    }
  }

  test("a heavy atom is reported exactly for quantiles inside its span") {
    // 60% of the mass is one repeated value spanning ranks [0.3, 0.9):
    // every centroid inside the span has that exact mean, so any interior
    // quantile must return it exactly — the atom case rank-error metrics
    // cannot judge
    val xs = Seq.fill(3000)(rnd.nextDouble() * 10) ++
      Seq.fill(6000)(42.0) ++ Seq.fill(1000)(90 + rnd.nextDouble() * 10)
    val (m, w) = digestOf(rnd.shuffle(xs))
    assert(math.abs(TDigest.quantile(m, w, 0.6) - 42.0) <= 1e-9)
    assert(math.abs(TDigest.quantile(m, w, 0.8) - 42.0) <= 1e-9)
  }

  test("pairwise merges of random shards preserve the bands (associativity in practice)") {
    val xs = shapes(1)._2(9000)
    val shards = xs.grouped(1000).toSeq
    val merged = new TDigestBuf(100)
    shards.foreach { sh =>
      val b = new TDigestBuf(100)
      sh.foreach(b.add(_, 1.0))
      merged.mergeBuf(b)
    }
    val bytes = merged.serialize()
    val bb = ByteBuffer.wrap(bytes); val n = bb.getInt
    val m = Array.fill(n)(bb.getDouble); val w = Array.fill(n)(bb.getDouble)
    assert(w.sum === xs.size.toDouble)
    Seq(0.1, 0.5, 0.99).foreach { q =>
      val est = TDigest.quantile(m, w, q)
      val tol = if (q <= 0.1 || q >= 0.9) 0.015 else 0.03
      assert(rankError(xs, est, q) <= tol, s"merge q=$q est=$est")
    }
  }
}
