package graft.sinks

import graft.model.{CdcSchema, SchemaChangeEvent, TableId}
import graft.operators.Changelog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink SPI — the Spark shape of the reference's `DataSink =
  * EventSinkProvider + MetadataApplier` (common/sink/DataSink.java:29-35,
  * MetadataApplier.java:33-50): a data path (`write`) plus a metadata path
  * (`applySchemaChange`). In the micro-batch design `write` is called once
  * per (batch, table) from `foreachBatch`, AFTER any schema changes of that
  * batch were applied — the ordering the reference enforces with its
  * FlushEvent protocol falls out of the batch boundary for free.
  */
/** Provenance of one `write` call within a streaming micro-batch: the
  * `foreachBatch` batch id plus the route leg (`"src→out"`). An N→1 route
  * writes the same sink table once per SOURCE within a batch, so the pair —
  * not the batch id alone — uniquely identifies the invocation; decorators
  * ([[graft.pipeline.QuantileMonitor.MonitorSink]]) key crash-replay
  * dedup on it.
  */
final case class BatchCtx(batchId: Long, origin: String)

trait CdcSink {
  /** Apply DDL to the sink (called on the driver, between batches). */
  def applySchemaChange(e: SchemaChangeEvent): Unit = ()

  /** Write one table's changelog slice (envelope columns `__op`/`__seq`
    * + payload aligned with `schema`).
    */
  def write(id: TableId, changelog: DataFrame, schema: CdcSchema): Unit

  /** Batch-aware write: streaming callers pass their micro-batch provenance
    * so decorators can deduplicate crash-replayed batches; the default
    * ignores it — plain sinks are already idempotent per key and need no
    * replay awareness.
    */
  def writeBatch(id: TableId, changelog: DataFrame, schema: CdcSchema,
                 ctx: Option[BatchCtx]): Unit = write(id, changelog, schema)
}

/** Driver-side in-memory sink over [[ValuesDatabase]] — the test oracle sink
  * (reference: ValuesDataSink). Collects each batch; only for tests.
  */
final class ValuesSink(val db: ValuesDatabase) extends CdcSink {
  import graft.model._

  override def applySchemaChange(e: SchemaChangeEvent): Unit = db.apply(e)

  override def write(id: TableId, changelog: DataFrame, schema: CdcSchema): Unit = {
    val cols = schema.columnNames
    // per-key ordering within the batch: sort by seq before applying
    val rows = changelog.orderBy(col(Changelog.SeqCol)).collect()
    // the pipeline writes tables concurrently; the in-memory db is one map
    db.synchronized {
      rows.foreach { r =>
        val payload = cols.map(c => r.getAs[Any](c))
        val op = r.getAs[String](Changelog.OpCol)
        db.apply(DataChangeEvent(id, Op.of(op),
          before = if (op == "DELETE" || op == "UPDATE") Some(payload) else None,
          after = if (op == "DELETE") None else Some(payload)))
      }
    }
  }
}

/** Parquet-backed upsert sink: maintains one parquet directory per table as
  * materialized state; each batch merges last-image-per-PK changes into it.
  *
  * This is the lakehouse `MERGE INTO` shape of the reference's DSQL sink
  * (SURVEY.md §2.2 "Iceberg/Delta: MERGE INTO in foreachBatch") without a
  * table format: state' = materialize(state-as-inserts ∪ batch). All heavy
  * work is distributed (one hash aggregation keyed by PK); the driver only
  * moves directories. Idempotent per batch — replaying a batch converges to
  * the same state, so at-least-once delivery becomes effectively-once.
  * Schema evolution: DDL rewrites state eagerly ([[applySchemaChange]]), and
  * the merge path ALSO coerces (cast + null-pad) on read as a belt-and-
  * braces for state that lags after a crash between DDL and rewrite.
  *
  * Bucketed mode partitions state by `pmod(xxhash64(pk), buckets)`: a batch
  * then reads and rewrites ONLY the PK-hash partitions it touches (partition
  * pruning on read, dynamic partition overwrite on write) — merge cost scales
  * with batch footprint, not table size. At 100 TB this is the difference
  * between O(state) and O(touched-buckets) per micro-batch; a production
  * deployment swaps in Delta/Iceberg MERGE behind the same interface.
  *
  * The bucket count is a LAYOUT property of the table, not of the writer: it
  * is persisted in a `<table>.layout` meta file at state creation and every
  * later write/merge resolves it from there — a writer configured with a
  * different constant can no longer silently prune against the wrong modulus
  * (r20). Pass [[ParquetUpsertSink.AutoBuckets]] to derive the count from the
  * first batch's size (one bucket per [[ParquetUpsertSink.RowsPerBucketConf]]
  * rows, guide §6 scale-adaptive file sizing): a 100 k-row local fixture gets
  * 1 bucket — one output file per merge, no 32-way small-file fan-out — while
  * a 10^9-row production snapshot gets ~2000, keeping per-bucket files in the
  * 10^5-10^6-row (~64-128 MB) range either way.
  */
class ParquetUpsertSink(rootDir: String, buckets: Int = 0) extends CdcSink {
  import ParquetUpsertSink.{AutoBuckets, MaxDerivedBuckets, RowsPerBucketConf, SwapReady}

  private val BucketCol = "__bucket"
  // concurrent per-table writes are fine; same-table writes must serialize
  // (N→1 routes can hit one sink table from several sources in a batch)
  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // resolved bucket count per table path (meta file wins over the constructor)
  private val layoutCache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  def tablePath(id: TableId): String =
    s"$rootDir/${Seq(id.namespace, id.schemaName, id.tableName).filter(_.nonEmpty).mkString("__")}"

  private def layoutPath(path: String) = new org.apache.hadoop.fs.Path(path + ".layout")

  /** Bucket count this table's state is laid out with: the `.layout` meta
    * file when present (the on-disk layout is ground truth — a writer whose
    * constant disagrees would prune state reads with the wrong modulus and
    * lose rows), else the constructor's value, deriving it from the first
    * batch when that is [[AutoBuckets]]. Cached per table; the meta read is
    * one small-file open on the table's first write in this JVM.
    */
  private def effectiveBuckets(spark: org.apache.spark.sql.SparkSession,
                               fs: org.apache.hadoop.fs.FileSystem, path: String,
                               stateExists: Boolean, incoming: DataFrame): Int =
    layoutCache.computeIfAbsent(path, _ => {
      val lp = layoutPath(path)
      if (fs.exists(lp)) {
        val in = fs.open(lp)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      } else if (buckets == AutoBuckets) {
        require(!stateExists, s"state at $path predates its layout meta; " +
          "recreate it or construct the sink with its explicit bucket count")
        val target = spark.conf.getOption(RowsPerBucketConf).map(_.toLong).getOrElse(524288L)
        val rows = incoming.count() // first write only; fills the batch cache
        math.max(1L, math.min(MaxDerivedBuckets.toLong, (rows + target - 1) / target)).toInt
      } else buckets
    }: Integer)

  /** Persist the resolved bucket count next to the state dir (sibling file:
    * it must survive the per-bucket swaps and the DDL rewrite of the dir).
    */
  private def writeLayoutIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
                                  path: String, m: Int): Unit = {
    val lp = layoutPath(path)
    if (!fs.exists(lp)) {
      val out = fs.create(lp, true)
      try out.write(m.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  private def withBucket(df: DataFrame, pks: Seq[String], m: Int): DataFrame =
    df.withColumn(BucketCol, pmod(xxhash64(pks.map(col): _*), lit(m.toLong)).cast("int"))

  /** Coerce on-disk state (possibly older schema) to the evolved shape and
    * stamp it as lowest-seq inserts so batch rows win per PK.
    */
  private def stateAsInserts(state: DataFrame, schema: CdcSchema): DataFrame = {
    val present = state.columns.toSet
    state.select(schema.struct.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
      .withColumn(Changelog.OpCol, lit("INSERT"))
      .withColumn(Changelog.SeqCol, lit(Long.MinValue))
  }

  override def write(id: TableId, changelog: DataFrame, schema: CdcSchema): Unit =
    tableLocks.computeIfAbsent(tablePath(id), _ => new Object).synchronized {
      doWrite(id, changelog, schema)
    }

  /** DDL applies EAGERLY to on-disk state (the reference's MetadataApplier
    * runs its ALTER TABLE before the data resumes): lazy coercion alone
    * would leave buckets a batch never touches under the OLD shape, and a
    * schema-less `spark.read.parquet` of mixed-shape files infers whichever
    * file it samples — a dropped column could resurface or an added one
    * vanish from [[read]]. A rewrite per DDL event is O(state), but DDL is
    * rare by construction; the Delta/Iceberg swap-in does the same change as
    * a metadata-only commit. Rename never arrives here — the routed-schema
    * diff normalizes it to add+drop ([[graft.operators.SchemaDerivator.diff]],
    * reference SchemaDerivator.java:154-296) — but is handled for direct SPI
    * callers. Each rewrite is idempotent (guarded on the current on-disk
    * shape), so a crash-replayed batch re-applying its in-band DDL converges.
    */
  override def applySchemaChange(e: SchemaChangeEvent): Unit = {
    import graft.model._
    e match {
      case CreateTableEvent(_, _) => () // state materializes on first write
      case AddColumnEvent(id, n, dt, _) =>
        rewriteState(id)(df => if (df.columns.contains(n)) df
                               else df.withColumn(n, lit(null).cast(dt)))
      case DropColumnEvent(id, n) => rewriteState(id)(_.drop(n))
      case RenameColumnEvent(id, f, t) => rewriteState(id)(_.withColumnRenamed(f, t))
      case AlterColumnTypeEvent(id, n, dt) =>
        rewriteState(id)(df => if (df.columns.contains(n)) df.withColumn(n, col(n).cast(dt))
                               else df)
      case TruncateTableEvent(id) => deleteState(id)
      case DropTableEvent(id) => deleteState(id)
    }
  }

  /** Rewrite the whole state dir through `fn` with the same write-new-then-
    * swap commit as [[doWrite]]; no-op when the table has no state yet.
    */
  private def rewriteState(id: TableId)(fn: DataFrame => DataFrame): Unit =
    tableLocks.computeIfAbsent(tablePath(id), _ => new Object).synchronized {
      val spark = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .getOrElse(throw new IllegalStateException("no SparkSession for sink DDL"))
      val path = tablePath(id)
      val fs = hfs(spark, path)
      val dst = new org.apache.hadoop.fs.Path(path)
      recoverCrashedSwap(fs, path, dst)
      if (fs.exists(dst)) {
        val state = spark.read.parquet(path)
        val next = fn(state)
        // cheap no-op detection: same shape → skip the rewrite (idempotent
        // replay of a batch's DDL, or a drop of a never-present column)
        if (next.schema != state.schema) {
          val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
          val old = new org.apache.hadoop.fs.Path(path + ".old")
          fs.delete(tmp, true)
          val writer = next.write.mode("overwrite")
          // layout-faithful: the on-disk bucket column, not the constructor
          // constant, decides whether the rewrite keeps the partitioning
          (if (next.columns.contains(BucketCol)) writer.partitionBy(BucketCol)
           else writer).parquet(tmp.toString)
          fs.delete(old, true)
          renameOrThrow(fs, dst, old)
          try renameOrThrow(fs, tmp, dst)
          catch {
            case ex: java.io.IOException =>
              if (!fs.rename(old, dst)) {
                ex.addSuppressed(new java.io.IOException(s"restore of $old also failed"))
              }
              throw ex
          }
          fs.delete(old, true)
          ()
        }
      }
    }

  private def deleteState(id: TableId): Unit =
    tableLocks.computeIfAbsent(tablePath(id), _ => new Object).synchronized {
      val spark = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .getOrElse(throw new IllegalStateException("no SparkSession for sink DDL"))
      val fs = hfs(spark, tablePath(id))
      Seq("", ".tmp", ".old", ".layout").foreach(sfx =>
        fs.delete(new org.apache.hadoop.fs.Path(tablePath(id) + sfx), true))
      // a recreated table derives a fresh layout from its new first batch
      layoutCache.remove(tablePath(id))
      ()
    }

  /** All state moves go through Hadoop [[org.apache.hadoop.fs.FileSystem]] so
    * the sink works on any Hadoop-compatible store (local, HDFS, object
    * stores with a committer), and every rename is CHECKED — a false return
    * is a loud failure, never a silently lost table state.
    */
  protected def hfs(spark: org.apache.spark.sql.SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                            src: org.apache.hadoop.fs.Path,
                            dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"upsert-sink commit failed: rename $src -> $dst " +
        "(state preserved; check permissions / cross-filesystem paths)")

  /** Crash recovery for the swap commit: a process that died between
    * rename(dst→old) and rename(tmp→dst) left the ONLY copy of table state
    * under `.old` (or, bucketed, under `.tmp/.old_N`) — restore it before
    * reading, or the next write would treat the table as empty and destroy
    * the sole copy. A stale `.old` next to a live `dst` (died after commit,
    * before cleanup) is NOT restored; it is deleted by the commit sequence.
    *
    * Bucketed states recover in one of two modes (r20):
    *  - `.tmp/.swap_ready` present — the batch's parquet write completed and
    *    its swap phase began (the marker is created between the two, and
    *    deleted if a swap rename fails and is rolled back): roll the batch
    *    FORWARD by finishing the remaining per-bucket moves. The tmp contents
    *    are complete by construction, every swap decision is final, and a
    *    displaced bucket with no replacement dir was emptied by deletes on
    *    purpose — nothing is ever resurrected, no per-bucket marker needed.
    *  - no marker — a half-written tmp, or a state left by the pre-r20
    *    protocol: restore displaced buckets whose dst is absent (rollback),
    *    honoring that protocol's `.done_N` emptied-bucket markers.
    */
  private def recoverCrashedSwap(fs: org.apache.hadoop.fs.FileSystem, path: String,
                                 dst: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (!fs.exists(dst) && fs.exists(old)) renameOrThrow(fs, old, dst)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    if (fs.exists(tmp)) {
      val entries = fs.listStatus(tmp)
      if (entries.exists(_.getPath.getName == SwapReady)) {
        entries.filter(_.getPath.getName.startsWith(s"$BucketCol=")).foreach { s =>
          val b = s.getPath.getName.stripPrefix(s"$BucketCol=")
          val bucketDst = new org.apache.hadoop.fs.Path(s"$path/$BucketCol=$b")
          if (fs.exists(bucketDst))
            renameOrThrow(fs, bucketDst, new org.apache.hadoop.fs.Path(s"${tmp.toString}/.old_$b"))
          renameOrThrow(fs, s.getPath, bucketDst)
        }
        fs.delete(tmp, true)
        ()
      } else {
        entries.filter(_.getPath.getName.startsWith(".old_")).foreach { s =>
          val b = s.getPath.getName.stripPrefix(".old_")
          val bucketDst = new org.apache.hadoop.fs.Path(s"$path/$BucketCol=$b")
          val done = new org.apache.hadoop.fs.Path(s"${tmp.toString}/.done_$b")
          if (!fs.exists(bucketDst) && !fs.exists(done)) renameOrThrow(fs, s.getPath, bucketDst)
        }
      }
    }
  }

  private def doWrite(id: TableId, changelog: DataFrame, schema: CdcSchema): Unit = {
    require(schema.primaryKeys.nonEmpty, s"upsert sink requires primary keys on $id")
    val spark = changelog.sparkSession
    val path = tablePath(id)
    val fs = hfs(spark, path)
    val dst = new org.apache.hadoop.fs.Path(path)
    recoverCrashedSwap(fs, path, dst)

    val cols = schema.columnNames.map(col)
    val incoming = changelog.select(cols :+ col(Changelog.OpCol) :+ col(Changelog.SeqCol): _*)

    val exists = fs.exists(dst)
    val m =
      if (buckets == 0 && !layoutCache.containsKey(path) && !fs.exists(layoutPath(path))) 0
      else effectiveBuckets(spark, fs, path, exists, incoming)
    if (m > 0) writeBucketed(spark, path, exists, incoming, schema, m)
    else {
      val merged =
        if (exists)
          Changelog.materialize(
            stateAsInserts(spark.read.parquet(path), schema).unionByName(incoming),
            schema.primaryKeys)
        else Changelog.materialize(incoming, schema.primaryKeys)

      // write-new-then-swap: readers of `path` never see a half-written state
      val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
      val old = new org.apache.hadoop.fs.Path(path + ".old")
      merged.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(old, true)
      val hadState = fs.exists(dst)
      if (hadState) renameOrThrow(fs, dst, old)
      try renameOrThrow(fs, tmp, dst)
      catch { // restore the previous state before surfacing the failure
        case e: java.io.IOException =>
          if (hadState && !fs.rename(old, dst)) {
            e.addSuppressed(new java.io.IOException(s"restore of $old also failed"))
          }
          throw e
      }
      fs.delete(old, true)
      ()
    }
  }

  /** Bucketed path: merge + rewrite only the PK-hash partitions the batch
    * touches. Writes the merged touched buckets to a side directory, then
    * swaps each touched `__bucket=N` dir in (a bucket whose rows were all
    * deleted is swapped to absent). NOT dynamic partition overwrite: that
    * only rewrites partitions present in the OUTPUT, so a fully-deleted
    * bucket would keep its stale files — and it would read and overwrite the
    * same path in one job.
    *
    * Swap-phase FS traffic is batch-constant + one rename per moved dir
    * (r20): one listing of each side replaces the per-bucket exists probes,
    * and the single `.swap_ready` marker (created between the completed
    * parquet write and the first rename, deleted with tmp) replaces the
    * per-bucket `.done_N` markers — recovery rolls a marker-bearing tmp
    * FORWARD instead of restoring, see [[recoverCrashedSwap]].
    */
  private def writeBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                            exists: Boolean, incoming: DataFrame, schema: CdcSchema,
                            m: Int): Unit = {
    // cache the PRE-bucket projection: both consumers (touched probe, merged
    // write) re-derive the bucket hash from it, and the Auto-derive count on
    // a table's first write fills the same cache instead of a second parse
    val inc = incoming.cache()
    try {
      val bucketed = withBucket(inc, schema.primaryKeys, m)
      val touched = bucketed.select(BucketCol).distinct().collect().map(_.getInt(0)).toSeq
      val merged = if (exists) {
        // partition pruning: only the touched __bucket=N dirs are read
        val state = spark.read.parquet(path).where(col(BucketCol).isin(touched: _*))
        Changelog.materialize(
          withBucket(stateAsInserts(state, schema), schema.primaryKeys, m).unionByName(bucketed),
          schema.primaryKeys :+ BucketCol) // bucket is pk-functional: same groups
      } else Changelog.materialize(bucketed, schema.primaryKeys :+ BucketCol)

      val fs = hfs(spark, path)
      val tmp = path + ".tmp"
      // one write task per touched bucket: buckets are sized to the target
      // file size at layout derivation, so task == output file == bucket
      // (the previous keyless-width repartition left most tasks empty when
      // touched ≪ spark.sql.shuffle.partitions)
      merged.repartition(math.max(touched.size, 1), col(BucketCol))
        .write.mode("overwrite").partitionBy(BucketCol).parquet(tmp)

      fs.mkdirs(new org.apache.hadoop.fs.Path(path))
      writeLayoutIfAbsent(fs, path, m)
      val swapReady = new org.apache.hadoop.fs.Path(s"$tmp/$SwapReady")
      val _ = fs.mkdirs(swapReady)
      // ONE listing of each side replaces 2×touched exists round-trips
      val existing = bucketSet(fs, path)
      val produced = bucketSet(fs, tmp)
      touched.foreach { b =>
        val dst = new org.apache.hadoop.fs.Path(s"$path/$BucketCol=$b")
        val src = new org.apache.hadoop.fs.Path(s"$tmp/$BucketCol=$b")
        // displace-then-swap: the old bucket moves into the (dot-prefixed,
        // reader-invisible) tmp area first, so a failed swap can restore it —
        // never delete state before its replacement is in place
        val displaced = new org.apache.hadoop.fs.Path(s"$tmp/.old_$b")
        val hadState = existing(b)
        if (hadState) renameOrThrow(fs, dst, displaced)
        if (produced(b)) {
          try renameOrThrow(fs, src, dst)
          catch {
            case e: java.io.IOException =>
              if (hadState && !fs.rename(displaced, dst)) {
                e.addSuppressed(new java.io.IOException(s"restore of bucket $b also failed"))
              }
              // the batch did NOT commit: drop the roll-forward marker so
              // recovery does not silently apply it later (recovery then runs
              // in rollback mode, where the .done_N markers below protect
              // this batch's already-final emptied buckets)
              try { fs.delete(swapReady, true); () }
              catch { case _: java.io.IOException => () }
              throw e
          }
        } else if (hadState) {
          // bucket emptied by deletes: dst stays absent BY DESIGN; the marker
          // only matters to rollback-mode recovery (see the failure path
          // above) — roll-forward never resurrects a displaced bucket
          val _ = fs.mkdirs(new org.apache.hadoop.fs.Path(s"$tmp/.done_$b"))
        }
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    } finally { inc.unpersist(); () }
  }

  /** Bucket ids present as `__bucket=N` child dirs (one listing). */
  private def bucketSet(fs: org.apache.hadoop.fs.FileSystem, dir: String): Set[Int] =
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$BucketCol="))
      .map(_.stripPrefix(s"$BucketCol=").toInt).toSet

  def read(spark: org.apache.spark.sql.SparkSession, id: TableId): DataFrame = {
    val path = tablePath(id)
    // a crashed swap may have left the only state copy displaced; readers
    // recover it too, not just the next write
    tableLocks.computeIfAbsent(path, _ => new Object).synchronized {
      recoverCrashedSwap(hfs(spark, path), path, new org.apache.hadoop.fs.Path(path))
    }
    val df = spark.read.parquet(path)
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }
}

object ParquetUpsertSink {
  /** `buckets` sentinel: derive the bucket count from the first batch's row
    * count — one bucket per [[RowsPerBucketConf]] rows, clamped to
    * [1, [[MaxDerivedBuckets]]] — and persist it in the table's layout meta.
    */
  val AutoBuckets: Int = -1
  /** Target rows per PK-hash bucket for [[AutoBuckets]] derivation (Spark
    * conf; default 524288 ≈ 64-128 MB parquet at typical CDC row widths —
    * guide §6's output-file sizing band).
    */
  val RowsPerBucketConf = "spark.graft.upsert.rowsPerBucket"
  val MaxDerivedBuckets = 4096
  /** Swap-phase-begun marker inside a batch's tmp dir (see recoverCrashedSwap). */
  private[sinks] val SwapReady = ".swap_ready"
}

/** JDBC upsert sink: DDL via [[UpsertSql]], data via [[UpsertWriter]] —
  * the full DSQL-sink port (SURVEY.md §2.2).
  */
final class JdbcUpsertSink(connectionFactory: () => java.sql.Connection,
                           batchSize: Int = 1000,
                           applyDestructive: Boolean = false) extends CdcSink {
  import graft.model._

  private def exec(sql: String): Unit = {
    val c = connectionFactory()
    try { val st = c.createStatement(); st.execute(sql); st.close() } finally c.close()
  }

  /** Lossless type transitions per current information_schema type name:
    * only these are auto-applied. Everything else (narrowing, lossy casts)
    * is destructive and gated — the reference applier logs and skips
    * changes it won't do (DsqlSink.java:81-89).
    */
  private val widensTo: Map[String, Set[String]] = Map(
    // int→DECIMAL transitions are judged precision-aware in applySchemaChange
    "smallint" -> Set("integer", "bigint", "real", "double precision", "text"),
    "integer" -> Set("bigint", "double precision", "text"),
    "bigint" -> Set("text"),
    "real" -> Set("double precision", "text"),
    "double precision" -> Set("text"),
    "numeric" -> Set("text"),
    "character varying" -> Set("text"),
    "date" -> Set("timestamp without time zone", "timestamp with time zone", "text"),
    "timestamp without time zone" -> Set("timestamp with time zone", "text"),
    "boolean" -> Set("text")
  )

  /** information_schema (type name, numeric precision, numeric scale) of a
    * live column (None when absent). Precision/scale are None for
    * non-numeric and for UNCONSTRAINED numeric columns.
    */
  private def currentType(id: TableId, column: String): Option[(String, Option[Int], Option[Int])] = {
    val c = connectionFactory()
    try {
      val st = c.prepareStatement(
        "SELECT data_type, numeric_precision, numeric_scale FROM information_schema.columns " +
          "WHERE table_schema = ? AND table_name = ? AND column_name = ?")
      st.setString(1, if (id.schemaName.nonEmpty) id.schemaName else "public")
      st.setString(2, id.tableName)
      st.setString(3, column)
      val rs = st.executeQuery()
      val r = if (rs.next()) {
        def optInt(i: Int): Option[Int] = {
          val v = rs.getInt(i); if (rs.wasNull()) None else Some(v)
        }
        Some((rs.getString(1).toLowerCase, optInt(2), optInt(3)))
      } else None
      st.close()
      r
    } finally c.close()
  }

  /** NUMERIC(p,s) → NUMERIC(p',s') is lossless only when the scale does not
    * shrink AND the integer-digit headroom (p−s) does not shrink —
    * information_schema reports 'numeric' for every precision, so the name
    * comparison alone would wave narrowings through.
    */
  private def decimalWidens(cur: (Option[Int], Option[Int]), target: org.apache.spark.sql.types.DecimalType): Boolean =
    cur match {
      case (Some(p), Some(s)) =>
        target.scale >= s && (target.precision - target.scale) >= (p - s)
      case _ => false // unconstrained numeric: only TEXT is wider
    }

  /** DDL-type string → information_schema data_type name. */
  private def infoSchemaName(ddlType: String): String = ddlType.toLowerCase match {
    case t if t.startsWith("numeric") => "numeric"
    case "timestamptz" => "timestamp with time zone"
    case "timestamp" => "timestamp without time zone"
    case t => t
  }

  override def applySchemaChange(e: SchemaChangeEvent): Unit = e match {
    case CreateTableEvent(id, s) => exec(UpsertSql.createTable(id, s))
    case AddColumnEvent(id, n, dt, pos) => exec(UpsertSql.addColumn(id, n, dt, pos))
    case DropColumnEvent(id, n) => exec(UpsertSql.dropColumn(id, n))
    case RenameColumnEvent(id, f, t2) => exec(UpsertSql.renameColumn(id, f, t2))
    case TruncateTableEvent(id) => exec(UpsertSql.truncate(id))
    // the sink is public API, so it cannot assume only the widening registry
    // sends AlterColumnType: verify the transition against the live column
    // type and auto-apply only lossless widenings; anything else needs the
    // applyDestructive opt-in (the USING ::type cast would let a narrowing
    // change succeed lossily).
    case AlterColumnTypeEvent(id, n, dt) =>
      val target = infoSchemaName(UpsertSql.pgType(dt))
      val safe = currentType(id, n) match {
        case Some((cur, p, s)) => dt match {
          // a DECIMAL target is only wider when it has the scale AND the
          // integer-digit headroom for every current value
          case d: org.apache.spark.sql.types.DecimalType => cur match {
            case "numeric" => decimalWidens((p, s), d)
            case "smallint" => d.precision - d.scale >= 5
            case "integer" => d.precision - d.scale >= 10
            case "bigint" => d.precision - d.scale >= 19
            case _ => false
          }
          case _ =>
            (cur == target && target != "numeric") ||
              widensTo.getOrElse(cur, Set.empty).contains(target)
        }
        case None => false // unknown column: nothing safe to verify against
      }
      if (safe || applyDestructive) exec(UpsertSql.alterColumnType(id, n, dt))
      else {
        // scalastyle:off println
        println(s"[graft-sink] SKIP non-widening AlterColumnType $id.$n -> $target " +
          "(set applyDestructive=true to force)")
        // scalastyle:on
      }
    case DropTableEvent(id) => if (applyDestructive) exec(UpsertSql.dropTable(id))
  }

  override def write(id: TableId, changelog: DataFrame, schema: CdcSchema): Unit =
    new UpsertWriter(connectionFactory, batchSize).writeBatch(changelog, id, schema)
}
