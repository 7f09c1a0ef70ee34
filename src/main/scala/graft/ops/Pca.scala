package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * stage of embedding pipelines (SemDeDup-style clustering, ANN index
  * build, drift visualization all run better in a decorrelated d'≪d
  * space).
  *
  * Scale discipline (the sufficient-statistics split this repo uses for
  * correlation and drift): the CORPUS work is ONE scan producing the
  * d + d(d+1)/2 sufficient statistics — the mean vector and the UPPER
  * TRIANGLE of the Gram matrix Σ xxᵀ — via a custom
  * [[graft.functions.VectorSuffStatsAgg]] `TypedImperativeAggregate`
  * whose buffer does the rank-1 update in place (no d²-element per-row
  * array, no (idx, value) explosion); map-side partial aggregation means
  * the exchange carries one ~d²/2-double buffer per partition and the
  * driver receives ONE aggregate row. The DRIVER work is O(d³) on the d×d
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

  /** The one-row suffstats frame: ONE corpus scan, map-side partial object
    * aggregation, one ~d²/2-double buffer per partition over the exchange.
    * Exposed so plan specs can pin the single-scan shape.
    */
  private[graft] def suffStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(org.apache.spark.sql.GraftBridge.column(
      graft.functions.VectorSuffStatsAgg(
        org.apache.spark.sql.GraftBridge.expression(col(vecCol)))
        .toAggregateExpression()).as("s"))

  /** One corpus scan → (n, Σx, upper-triangle Σxxᵀ) as ONE aggregate row →
    * driver eigen-decomposition. The width guard fires executor-side in
    * the aggregation buffer (before any O(d²) allocation) and is rethrown
    * as the underlying IllegalArgumentException here.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel =
    fitWithTrace(df, vecCol, k)._1

  /** [[fit]] plus the covariance trace (total variance) — free from the
    * same suffstats, so [[varianceReport]] costs zero extra scans.
    */
  private[graft] def fitWithTrace(df: DataFrame, vecCol: String, k: Int)
      : (PcaModel, Double) = {
    require(k >= 1, s"k=$k out of range") // before the corpus scan
    val row =
      try suffStats(df, vecCol).head()
      catch {
        case e: Throwable =>
          var c: Throwable = e
          while (c != null) {
            c match {
              case ia: IllegalArgumentException => throw ia
              case _ =>
            }
            c = c.getCause
          }
          throw e
      }
    val s = row.getStruct(0)
    require(s.getLong(0) > 0, "PCA fit over an empty corpus")
    val n = s.getLong(0).toDouble
    val sums = s.getSeq[Double](1).toArray
    val tri = s.getSeq[Double](2).toArray
    val dims = sums.length
    require(k <= dims, s"k=$k out of range for d=$dims")
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](dims, dims)
    var i = 0
    var idx = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val c = tri(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        idx += 1
        j += 1
      }
      i += 1
    }
    var trace = 0.0
    i = 0
    while (i < dims) { trace += cov(i)(i); i += 1 }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(ix => -values(ix)).take(k)
    (PcaModel(mean,
      order.map(ix => vectors.map(_(ix))).toArray,
      order.map(values(_)).toArray), trace)
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
    * choosing d'. Total variance is the covariance trace, read off the
    * same suffstats as the fit: the whole report is ONE corpus scan.
    */
  def varianceReport(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (model, totalVar) = fitWithTrace(df, vecCol, k)
    model.eigenvalues.zipWithIndex.map { case (ev, ix) =>
      (ix + 1L, ev, model.eigenvalues.take(ix + 1).sum / totalVar)
    }.toSeq.toDF("component", "variance", "cum_share")
  }
}
