package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Second-moment sufficient statistics of a vector column in ONE pass:
  * `(n, Σx, Σxxᵀ)` with the Gram matrix kept as its UPPER TRIANGLE only
  * (row-major, i ≤ j) — the symmetric lower half would double both the
  * aggregation buffer and the shuffle for zero information.
  *
  * This is the corpus half of [[graft.ops.Pca]]: a
  * `TypedImperativeAggregate` whose buffer performs the rank-1 update
  * directly from each row's vector (O(d²) FLOPs, no d²-element per-row
  * array ever materialized), partial-aggregated map-side so the exchange
  * carries ONE ~d²/2-double buffer per partition and the driver receives
  * ONE row — never d² (idx, value) rows, never a second scan for the mean.
  *
  * The width guard lives in the buffer's first `init` (executor-side,
  * before any O(d²) allocation): suffstats are sized for embedding widths
  * (64–4096), not feature matrices.
  */
final class SuffStatsBuf(val maxDim: Int) {
  var d: Int = -1
  var n: Long = 0L
  var sums: Array[Double] = Array.emptyDoubleArray
  var tri: Array[Double] = Array.emptyDoubleArray
  private var scratch: Array[Double] = Array.emptyDoubleArray

  private def init(dim: Int): Unit = {
    require(dim >= 1 && dim <= maxDim,
      s"d=$dim: the d² suffstat buffer and the O(d³) driver eigensolve are " +
        "sized for embedding widths, not feature matrices")
    d = dim
    sums = new Array[Double](dim)
    tri = new Array[Double](dim * (dim + 1) / 2)
    scratch = new Array[Double](dim)
  }

  /** Rank-1 update from one row's vector. */
  def add(arr: ArrayData, isFloat: Boolean): Unit = {
    val dim = arr.numElements()
    if (d < 0) init(dim)
    require(dim == d, s"ragged vector column: got length $dim, expected $d")
    var i = 0
    while (i < d) {
      require(!arr.isNullAt(i), s"null element at index $i in vector column")
      scratch(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    n += 1
    i = 0
    var idx = 0
    while (i < d) {
      val xi = scratch(i)
      sums(i) += xi
      var j = i
      while (j < d) { tri(idx) += xi * scratch(j); idx += 1; j += 1 }
      i += 1
    }
  }

  def merge(o: SuffStatsBuf): Unit = if (o.d >= 0) {
    if (d < 0) init(o.d)
    require(o.d == d, s"ragged vector column across partitions: $d vs ${o.d}")
    n += o.n
    var i = 0
    while (i < d) { sums(i) += o.sums(i); i += 1 }
    i = 0
    while (i < tri.length) { tri(i) += o.tri(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * (sums.length + tri.length))
    bb.putInt(d)
    bb.putLong(n)
    var i = 0
    while (i < sums.length) { bb.putDouble(sums(i)); i += 1 }
    i = 0
    while (i < tri.length) { bb.putDouble(tri(i)); i += 1 }
    bb.array()
  }
}

object SuffStatsBuf {
  def deserialize(bytes: Array[Byte], maxDim: Int): SuffStatsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new SuffStatsBuf(maxDim)
    val dim = bb.getInt
    if (dim >= 0) {
      b.d = dim
      b.n = bb.getLong
      b.sums = new Array[Double](dim)
      b.tri = new Array[Double](dim * (dim + 1) / 2)
      var i = 0
      while (i < b.sums.length) { b.sums(i) = bb.getDouble; i += 1 }
      i = 0
      while (i < b.tri.length) { b.tri(i) = bb.getDouble; i += 1 }
    }
    b
  }
}

/** `vector_suffstats(vec)` → struct<n: bigint, sums: array<double>,
  * gram: array<double>> where `gram` is the upper triangle of Σ xxᵀ.
  */
case class VectorSuffStatsAgg(
    child: Expression,
    maxDim: Int = 4096,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SuffStatsBuf] with UnaryLike[Expression] {

  override def prettyName: String = "vector_suffstats"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("gram", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>/array<double>, got ${other.catalogString}")
  }
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): SuffStatsBuf = new SuffStatsBuf(maxDim)
  override def update(b: SuffStatsBuf, input: InternalRow): SuffStatsBuf = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData], isFloat)
    b
  }
  override def merge(b: SuffStatsBuf, o: SuffStatsBuf): SuffStatsBuf = { b.merge(o); b }
  override def eval(b: SuffStatsBuf): Any = new GenericInternalRow(Array[Any](
    b.n, new GenericArrayData(b.sums), new GenericArrayData(b.tri)))
  override def serialize(b: SuffStatsBuf): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): SuffStatsBuf =
    SuffStatsBuf.deserialize(bytes, maxDim)
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSuffStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSuffStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSuffStatsAgg =
    copy(child = newChild)
}
