package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Exact per-group top-k over an UNSORTED stream — a bounded-heap
  * replacement for the `Sort → WindowGroupLimit → Exchange → Window`
  * chain Catalyst plans for `row_number() OVER (PARTITION BY g ORDER BY o)
  * <= k`.
  *
  * Why a physical operator (the reference's analog is its native engine's
  * operator runtime, e.g. flink-cdc-runtime's operator chain — here the
  * semantics Spark lacks is *sort-free* group limits): Spark's
  * `WindowGroupLimitExec` requires its child sorted on
  * (partitionSpec, orderSpec), so the partial pass pays an O(n log n)
  * per-partition sort (plus spill) of the FULL candidate stream before
  * discarding all but k rows per group. Maintaining a size-k heap per
  * group is O(n log k) with no sort buffer and no spill, and the
  * asymptotic gap grows with the candidate volume (for the IVF knn join,
  * candidates ∝ |L|·|R|·nprobe/k_centroids). The alternatives were
  * measured dead in SCALE.md r18: a raised heap only traded spill for GC,
  * and a TypedImperativeAggregate falls into ObjectHashAggregate's
  * 128-key sort-based fallback under default confs.
  *
  * Two modes, composed by [[HeapTopK.topKPerGroup]]:
  *  - PARTIAL (`rankAttr = None`): narrow, runs in the child's partitions,
  *    keeps each group's k best rows seen in THAT partition. Emits
  *    child.output unchanged.
  *  - FINAL (`rankAttr = Some(_)`): requires `ClusteredDistribution` on
  *    the group key (EnsureRequirements inserts the hash exchange), merges
  *    the per-partition survivors, and emits child.output plus a 1-based
  *    integer rank — exactly `row_number()`'s numbering under the same
  *    SortOrders.
  *
  * Exactness: both modes compare rows with the codegen'd catalyst
  * `RowOrdering` over the SAME SortOrder expressions a Window would use —
  * same null ordering, same IEEE double semantics, same tiebreak — so a
  * total order (ties broken by a unique column) gives results
  * bit-identical to the window formulation. A partial pass that keeps
  * exactly each group's per-partition top-k under a total order loses no
  * row of the global top-k (any dropped row has ≥ k better rows in its
  * own partition alone).
  *
  * Memory: each partition holds `groups-in-partition × k` retained rows
  * on heap (NOT spillable — the trade against the sort). Callers must
  * bound the retained width: project the stream to slim columns first
  * (the knn join's is 24 bytes/row) and size the group count per
  * partition (for a broadcast probe side every partition sees every
  * group; a shuffled-on-centroid probe side sees |L|·nprobe/width).
  * The contract is ENFORCED (r20): retained bytes are accounted per
  * partition and crossing [[HeapTopK.MaxRetainedBytesConf]] (default
  * 256 MB) fails FAST with a sizing message naming the levers — a loud
  * plan-shape error instead of an opaque executor OOM minutes later. A
  * sort-based fallback was considered and rejected: switching mid-stream
  * would first have to buffer the very rows whose size is the problem.
  */
object HeapTopK {

  /** Per-partition retained-bytes budget for the heap pass (Spark conf). */
  val MaxRetainedBytesConf = "spark.graft.heapTopK.maxRetainedBytes"
  val DefaultMaxRetainedBytes: Long = 256L * 1024 * 1024

  /** Exact per-group top-k with ranks: `k` best rows per `groupCols`
    * group under `orderCols`, plus a 1-based `rankCol` (row_number
    * semantics — make the ordering total, e.g. tiebreak on a unique id,
    * or ranks within ties are nondeterministic like row_number's).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
                   k: Int, rankCol: String): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    require(!df.columns.contains(rankCol),
      s"rank column '$rankCol' collides with an input column")
    val spark = df.sparkSession
    GraftBridge.registerStrategy(spark, HeapTopKStrategy)
    val group = groupCols.map(GraftBridge.convertedExpression)
    val order = orderCols.map(GraftBridge.sortOrderOf)
    val partial = HeapTopKPerGroup(group, order, k, None,
      GraftBridge.analyzedPlan(df))
    val rank = AttributeReference(rankCol, IntegerType, nullable = false)()
    GraftBridge.ofRows(spark,
      HeapTopKPerGroup(group, order, k, Some(rank), partial))
  }
}

/** Logical node for one heap pass; see [[HeapTopK]]. `rankAttr = None` is
  * the partial (narrow) pass, `Some(_)` the final (clustered) pass.
  */
case class HeapTopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    limit: Int,
    rankAttr: Option[AttributeReference],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): HeapTopKPerGroup =
    copy(child = newChild)
}

/** Plans [[HeapTopKPerGroup]]; registered idempotently per session via
  * `experimental.extraStrategies` by [[HeapTopK.topKPerGroup]].
  */
object HeapTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case HeapTopKPerGroup(g, o, l, r, child) =>
      HeapTopKPerGroupExec(g, o, l, r, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical heap pass; see [[HeapTopK]] for the contract. */
case class HeapTopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    limit: Int,
    rankAttr: Option[AttributeReference],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def outputPartitioning: Partitioning = child.outputPartitioning

  // the final pass needs every row of a group in one partition; the
  // partial pass runs wherever the candidates already are
  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isDefined) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val g = groupExprs
    val ord = order
    val k = limit
    val childOut = child.output
    val rank = rankAttr
    val budget = scala.util.Try(conf.getConfString(HeapTopK.MaxRetainedBytesConf).toLong)
      .getOrElse(HeapTopK.DefaultMaxRetainedBytes)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOut)
      // the EXACT window comparator: codegen'd catalyst ordering over the
      // same SortOrders (IEEE doubles, null ordering, direction)
      val cmp = RowOrdering.create(ord, childOut)
      // admitted rows are materialized UnsafeRow copies (exchange- and
      // buffer-safe); comparison happens BEFORE the copy, so only rows
      // that enter a heap pay it
      val toUnsafe = UnsafeProjection.create(childOut, childOut)
      val heaps = new java.util.LinkedHashMap[UnsafeRow, BoundedRowHeap]()
      // retained-rows budget (the documented memory contract, enforced):
      // groups × k UnsafeRow copies are NOT spillable, so crossing the
      // budget must fail loudly with the levers, not OOM the executor
      var retained = 0L
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new BoundedRowHeap(k, cmp)
          val kc = key.copy()
          heaps.put(kc, h)
          retained += kc.getSizeInBytes
        }
        retained += h.offer(row, toUnsafe)
        if (retained > budget) {
          throw new IllegalStateException(
            s"HeapTopK retained-rows budget exceeded: ${heaps.size()} groups x k=$k " +
            s"rows held $retained bytes in one partition (> $budget). The heap pass " +
            "trades the window sort for non-spillable per-group state — reduce it by " +
            "projecting the stream to slimmer columns, shuffling the probe side by the " +
            s"group key before the pass, lowering k, or raising ${HeapTopK.MaxRetainedBytesConf}.")
        }
      }
      val groups = heaps.values().iterator()
      rank match {
        case None =>
          new Iterator[InternalRow] {
            private var cur: Iterator[InternalRow] = Iterator.empty
            def hasNext: Boolean = {
              while (!cur.hasNext && groups.hasNext) cur = groups.next().rows
              cur.hasNext
            }
            def next(): InternalRow = cur.next()
          }
        case Some(ra) =>
          val proj = UnsafeProjection.create(childOut :+ ra, childOut :+ ra)
          val joined = new JoinedRow
          val rankRow = new GenericInternalRow(1)
          new Iterator[InternalRow] {
            private var cur: Iterator[InternalRow] = Iterator.empty
            def hasNext: Boolean = {
              while (!cur.hasNext && groups.hasNext) {
                val ranked = groups.next().ranked
                cur = ranked.iterator.zipWithIndex.map { case (r, i) =>
                  rankRow.update(0, i + 1)
                  proj(joined(r, rankRow))
                }
              }
              cur.hasNext
            }
            def next(): InternalRow = cur.next()
          }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): HeapTopKPerGroupExec =
    copy(child = newChild)
}

/** Size-bounded max-heap of rows: the root is the WORST retained row
  * under `cmp` (last in sort order), so admission is one root compare and
  * eviction replaces the root. O(log k) per admitted row, O(1) per
  * rejected row. Storage grows on demand (doubling, capped at k) — a
  * large k must cost memory proportional to rows RETAINED, not to k per
  * group (a top-1M request over thousands of small groups would
  * otherwise pre-allocate megabyte arrays each).
  */
private[plans] final class BoundedRowHeap(k: Int,
    cmp: java.util.Comparator[InternalRow]) {
  private var a = new Array[InternalRow](math.min(k, 16))
  private var n = 0

  /** Offers the row; returns the retained-bytes DELTA (admission adds the
    * copy's size, a replacement adds the size difference, a rejection is 0)
    * so the partition loop can enforce its budget without re-walking heaps.
    */
  def offer(row: InternalRow, toUnsafe: UnsafeProjection): Long = {
    if (n < k) {
      if (n == a.length) {
        a = java.util.Arrays.copyOf(a, math.min(k.toLong, 2L * n).toInt)
      }
      val c = toUnsafe(row).copy()
      a(n) = c
      siftUp(n)
      n += 1
      c.getSizeInBytes.toLong
    } else if (cmp.compare(row, a(0)) < 0) {
      val old = a(0).asInstanceOf[UnsafeRow].getSizeInBytes
      val c = toUnsafe(row).copy()
      a(0) = c
      siftDown()
      c.getSizeInBytes.toLong - old
    } else 0L
  }

  /** Retained rows, heap order (partial pass — downstream re-orders). */
  def rows: Iterator[InternalRow] = a.iterator.take(n)

  /** Retained rows in sort order (final pass — index+1 is the rank). */
  def ranked: Array[InternalRow] = {
    val out = java.util.Arrays.copyOf(a, n)
    java.util.Arrays.sort(out, cmp)
    out
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (cmp.compare(a(i), a(p)) > 0) {
        val t = a(i); a(i) = a(p); a(p) = t; i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && cmp.compare(a(l), a(m)) > 0) m = l
      if (r < n && cmp.compare(a(r), a(m)) > 0) m = r
      if (m == i) return
      val t = a(i); a(i) = a(m); a(m) = t; i = m
    }
  }
}
