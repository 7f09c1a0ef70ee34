package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * stage of embedding pipelines (SemDeDup-style clustering, ANN index
  * build, drift visualization all run better in a decorrelated d'≪d
  * space).
  *
  * Scale discipline (the sufficient-statistics split this repo uses for
  * correlation and drift): the CORPUS work is one scan producing the
  * d + d² sufficient statistics — the mean vector and the Gram matrix
  * Σ xxᵀ — as a flat per-row outer-product array exploded to (idx, value)
  * rows; map-side partial aggregation collapses each partition to ≤ d²
  * rows before the shuffle, so the exchange carries O(d² · partitions)
  * numbers, never the corpus. The DRIVER work is O(d³) on the d×d
  * covariance: a cyclic Jacobi eigensolver (deterministic sweep order, no
  * randomness), legitimate because d is the embedding width (64–4096),
  * not a data dimension. Projection back over the corpus is the existing
  * codegen'd [[graft.functions.CdcExpressions.projectVec]] — one narrow
  * WholeStageCodegen map, no shuffle.
  *
  * Determinism stance: eigenvalues/vectors of the EXACT covariance are
  * deterministic, but the covariance's double sums are partition-order
  * sensitive at the ULP, so cross-engine bit-equality is off the table —
  * the query is rows-only and `PcaSpec` asserts the invariant properties
  * (orthonormality, Cv = λv residuals, variance capture vs a naive
  * reference, projection equivalence) instead.
  */
object Pca {

  /** Fitted model: column means, principal components (k rows of length d,
    * orthonormal, sorted by descending eigenvalue), eigenvalues.
    */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                            eigenvalues: Array[Double])

  /** One corpus scan → (n, Σx, Σxxᵀ) → driver eigen-decomposition. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val dims = df.select(size(col(vecCol))).head.getInt(0)
    require(dims <= 4096, s"d=$dims: the d² suffstat row space and the O(d³) driver " +
      "eigensolve are sized for embedding widths, not feature matrices")
    require(k >= 1 && k <= dims, s"k=$k out of range for d=$dims")
    // flat outer product per row; posexplode → (idx, v); partial agg
    // collapses each partition to ≤ d(d+3)/2-ish rows pre-shuffle
    val upper = df.select(posexplode(expr(
        s"flatten(transform($vecCol, (x, i) -> " +
          s"transform($vecCol, (y, j) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))))"))
        .as(Seq("idx", "v")))
      .groupBy("idx").agg(sum("v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val sums = df.select(posexplode(col(vecCol)).as(Seq("idx", "v")))
      .groupBy("idx").agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val n = sums.head._3.toDouble
    val mean = new Array[Double](dims)
    sums.foreach { case (i, s, _) => mean(i) = s / n }
    val cov = Array.ofDim[Double](dims, dims)
    var i = 0
    while (i < dims) {
      var j = 0
      while (j < dims) {
        cov(i)(j) = upper(i * dims + j) / n - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(ix => -values(ix)).take(k)
    PcaModel(mean,
      order.map(ix => vectors.map(_(ix))).toArray,
      order.map(values(_)).toArray)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: rotate away the
    * largest off-diagonal entries in fixed sweep order until convergence.
    * Deterministic; O(d³) per sweep, ~8 sweeps for embedding-width inputs.
    * Returns (eigenvalues, eigenvector matrix with vectors as COLUMNS).
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-11) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // sign(0) must be +1 here: equal diagonal entries need the
            // full 45° rotation, not a no-op
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Project vectors into the fitted space: mean-center (zip_with) then
    * the codegen'd matrix product — one narrow map, no shuffle, no UDF.
    */
  def transform(df: DataFrame, vecCol: String, model: PcaModel,
                outCol: String = "pca"): DataFrame = {
    val meanLit = array(model.mean.map(m => lit(m.toFloat)): _*)
    val centered = zip_with(col(vecCol), meanLit, (x, m) => x - m)
    df.withColumn(outCol, graft.functions.CdcExpressions.projectVec(
      centered, model.components.map(_.map(_.toFloat))))
  }

  /** Explained-variance report: (component, eigenvalue, cumulative share
    * of TOTAL variance) — the curve every embedding pipeline reads before
    * choosing d'. Fits once; total variance is the covariance trace
    * (Σᵢ E[xᵢ²] − E[xᵢ]², one extra scalar scan).
    */
  def varianceReport(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val model = fit(df, vecCol, k)
    val n = df.count().toDouble
    val ss = df.select(sum(expr(
        s"aggregate($vecCol, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * x)")))
      .head.getDouble(0)
    val totalVar = ss / n - model.mean.map(m => m * m).sum
    model.eigenvalues.zipWithIndex.map { case (ev, ix) =>
      (ix + 1L, ev, model.eigenvalues.take(ix + 1).sum / totalVar)
    }.toSeq.toDF("component", "variance", "cum_share")
  }
}
