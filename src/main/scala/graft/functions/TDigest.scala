package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing extremely
  * accurate quantiles using t-digests", 2019) — the quantile member of the
  * sketch family (count-min, HLL, Bloom, MinHash). Implemented the way
  * Spark implements its own DataSketches aggregates: a
  * `TypedImperativeAggregate` whose in-memory buffer is a mutable centroid
  * digest, partial-aggregated map-side (the shuffle carries KB digests,
  * never values) and unioned losslessly at any rollup grouping.
  *
  * The merging-digest compression pass bounds centroid count by the scale
  * function k(q) = δ/2π · asin(2q−1): clusters are tiny near the tails
  * (where quantile queries need resolution) and wide at the median —
  * rank error is O(1/δ) at q=0.5 and far tighter at p99.
  *
  * Determinism stance (the [[graft.ops.DistinctSketch]] caveat, verbatim):
  * the abstract digest is order-sensitive — merging shards in different
  * orders yields slightly different centroids within the same error bound —
  * so estimates are intervals, never join keys; the bench query is
  * rows-only and the spec asserts rank-error bands, not bit equality.
  */
object TDigest {

  /** The persisted sketch column type: sorted centroid means + weights. */
  val sketchType: StructType = StructType(Seq(
    StructField("means", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("weights", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Analysis-time digest-struct shape check shared by the union aggregate
    * and the quantile query: two array<double> fields, any nullability.
    */
  private[functions] def checkSketchType(fn: String, dt: DataType): TypeCheckResult =
    dt match {
      case StructType(Array(
          StructField(_, ArrayType(DoubleType, _), _, _),
          StructField(_, ArrayType(DoubleType, _), _, _))) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects a digest struct<means:array<double>,weights:array<double>>, " +
          s"got ${other.catalogString}")
    }

  /** One merging-compression pass: co-sort (means, weights) and greedily
    * cluster under the k-scale bound. Pure function of its input ORDER —
    * the buffer pins (mean, weight) as the sort key so equal-mean
    * centroids from different shards cannot flip.
    */
  def cluster(cm: Array[Double], cw: Array[Double], compression: Int)
      : (Array[Double], Array[Double]) = {
    val m = cm.length
    if (m == 0) return (cm, cw)
    val order = Array.range(0, m).sortBy(i => (cm(i), cw(i)))
    var total = 0.0
    var i = 0
    while (i < m) { total += cw(i); i += 1 }
    def k(q: Double): Double =
      compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
    def kInv(x: Double): Double = {
      val s = math.sin(x * 2.0 * math.Pi / compression)
      (math.min(1.0, math.max(-1.0, s)) + 1.0) / 2.0
    }
    val om = new Array[Double](m)
    val ow = new Array[Double](m)
    var n = 0
    var wSoFar = 0.0
    var qLimit = kInv(k(0.0) + 1.0)
    var curM = cm(order(0))
    var curW = cw(order(0))
    i = 1
    while (i < m) {
      val x = cm(order(i)); val w = cw(order(i))
      if ((wSoFar + curW + w) / total <= qLimit) {
        curM += (x - curM) * (w / (curW + w)); curW += w
      } else {
        om(n) = curM; ow(n) = curW; n += 1
        wSoFar += curW
        qLimit = kInv(k(wSoFar / total) + 1.0)
        curM = x; curW = w
      }
      i += 1
    }
    om(n) = curM; ow(n) = curW; n += 1
    (java.util.Arrays.copyOf(om, n), java.util.Arrays.copyOf(ow, n))
  }

  /** Quantile estimate from a clustered digest: midpoint-rank linear
    * interpolation between adjacent centroid means (the standard t-digest
    * query; min/max are approximated by the boundary centroids).
    */
  def quantile(means: Array[Double], weights: Array[Double], q: Double): Double = {
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val target = math.min(1.0, math.max(0.0, q)) * total
    // cumulative midpoints: centroid i sits at cum_i + w_i / 2
    var cum = 0.0
    var prevMid = weights(0) / 2.0
    if (target <= prevMid) return means(0)
    i = 1
    while (i < n) {
      val mid = cum + weights(i - 1) + weights(i) / 2.0
      if (target <= mid) {
        val f = (target - prevMid) / math.max(mid - prevMid, Double.MinPositiveValue)
        return means(i - 1) + f * (means(i) - means(i - 1))
      }
      cum += weights(i - 1)
      prevMid = mid
      i += 1
    }
    means(n - 1)
  }
}

/** Mutable aggregation buffer: a clustered core plus an append tail that
  * compresses in amortized batches (per-row recluster would be O(n·δ)).
  */
final class TDigestBuf(val compression: Int) {
  private var means: Array[Double] = Array.emptyDoubleArray
  private var weights: Array[Double] = Array.emptyDoubleArray
  private val cap = math.max(compression * 4, 256)
  private val tm = new Array[Double](cap)
  private val tw = new Array[Double](cap)
  private var tn = 0

  def add(x: Double, w: Double): Unit = {
    if (tn == cap) flush()
    tm(tn) = x; tw(tn) = w; tn += 1
  }

  def addAll(om: Array[Double], ow: Array[Double]): Unit = {
    var i = 0
    while (i < om.length) { add(om(i), ow(i)); i += 1 }
  }

  def mergeBuf(o: TDigestBuf): Unit = {
    o.flush()
    addAll(o.means, o.weights)
  }

  def flush(): Unit = if (tn > 0) {
    val cm = new Array[Double](means.length + tn)
    val cw = new Array[Double](means.length + tn)
    System.arraycopy(means, 0, cm, 0, means.length)
    System.arraycopy(weights, 0, cw, 0, means.length)
    System.arraycopy(tm, 0, cm, means.length, tn)
    System.arraycopy(tw, 0, cw, means.length, tn)
    tn = 0
    val (om, ow) = TDigest.cluster(cm, cw, compression)
    means = om; weights = ow
  }

  def toRow: InternalRow = {
    flush()
    new GenericInternalRow(Array[Any](
      new GenericArrayData(means), new GenericArrayData(weights)))
  }

  def serialize(): Array[Byte] = {
    flush()
    val bb = ByteBuffer.allocate(4 + 16 * means.length)
    bb.putInt(means.length)
    var i = 0
    while (i < means.length) { bb.putDouble(means(i)); i += 1 }
    i = 0
    while (i < weights.length) { bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigestBuf {
  def deserialize(bytes: Array[Byte], compression: Int): TDigestBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TDigestBuf(compression)
    val om = new Array[Double](n)
    val ow = new Array[Double](n)
    var i = 0
    while (i < n) { om(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { ow(i) = bb.getDouble; i += 1 }
    b.addAll(om, ow)
    b
  }
}

/** `tdigest_sketch_agg(value, δ)` — build a digest from raw doubles. */
case class TDigestAgg(
    child: Expression,
    compression: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf] with UnaryLike[Expression] {

  override def prettyName: String = "tdigest_sketch_agg"
  override def dataType: DataType = TDigest.sketchType
  override def nullable: Boolean = false
  // analysis-time gate: a string/date/binary child must fail resolution
  // with a clear message, not ClassCastException at execution
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a numeric value column, got ${other.catalogString}")
  }
  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)
  override def update(b: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null) b.add(v match {
      case d: Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
    }, 1.0)
    b
  }
  override def merge(b: TDigestBuf, o: TDigestBuf): TDigestBuf = { b.mergeBuf(o); b }
  override def eval(b: TDigestBuf): Any = b.toRow
  override def serialize(b: TDigestBuf): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestBuf =
    TDigestBuf.deserialize(bytes, compression)
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
}

/** `tdigest_union_agg(sketch, δ)` — roll persisted digests up to any
  * coarser grouping; bytes proportional to cells, never rows.
  */
case class TDigestUnionAgg(
    child: Expression,
    compression: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf] with UnaryLike[Expression] {

  override def prettyName: String = "tdigest_union_agg"
  override def dataType: DataType = TDigest.sketchType
  override def nullable: Boolean = false
  // shape-only struct check (not strict equality with `sketchType`): a
  // digest read back from parquet may differ in field/element nullability
  override def checkInputDataTypes(): TypeCheckResult =
    TDigest.checkSketchType(prettyName, child.dataType)
  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)
  override def update(b: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      b.addAll(row.getArray(0).toDoubleArray(), row.getArray(1).toDoubleArray())
    }
    b
  }
  override def merge(b: TDigestBuf, o: TDigestBuf): TDigestBuf = { b.mergeBuf(o); b }
  override def eval(b: TDigestBuf): Any = b.toRow
  override def serialize(b: TDigestBuf): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestBuf =
    TDigestBuf.deserialize(bytes, compression)
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestUnionAgg =
    copy(child = newChild)
}

/** `tdigest_quantile(sketch, q)` — scalar quantile query over a digest
  * struct. CodegenFallback is deliberate here and does NOT violate the
  * codegen-hot-path rule: this evaluates once per SKETCH-TABLE row (cell
  * cardinality, bounded), never over the corpus — the corpus-scale work
  * is the codegen'd aggregation that built the digests.
  */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def prettyName: String = "tdigest_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    TDigest.checkSketchType(prettyName, left.dataType) match {
      case TypeCheckResult.TypeCheckSuccess if right.dataType != DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a DOUBLE quantile, got ${right.dataType.catalogString}")
      case r => r
    }
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val q = right.eval(input)
    if (s == null || q == null) null
    else {
      val row = s.asInstanceOf[InternalRow]
      TDigest.quantile(row.getArray(0).toDoubleArray(),
        row.getArray(1).toDoubleArray(), q.asInstanceOf[Double])
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TDigestQuantile =
    copy(left = newLeft, right = newRight)
}
