package graft.sinks

import graft.SparkSpec
import graft.model.{CdcSchema, TableId}
import graft.operators.Changelog
import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}

/** The swap-commit of [[ParquetUpsertSink]] must be atomic-or-loud: a rename
  * that cannot complete has to THROW with the previous state intact — a
  * silently dropped Boolean here means a batch reports success while the
  * table state is gone (round-2 verdict, "What's wrong #1").
  *
  * Rename failures are injected through a [[FilterFileSystem]] that refuses
  * renames of matching paths — deterministic on any OS/user (permission
  * tricks don't work under root, which is how CI runs).
  */
class ParquetSinkCommitSpec extends SparkSpec {
  import spark.implicits._

  private val id = TableId.of("db", "t")
  private val schema = CdcSchema.of("id" -> "BIGINT", "v" -> "STRING").copy(primaryKeys = Seq("id"))

  private def batch(rows: (Long, String, String, Long)*) =
    rows.toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)

  /** Refuses renames whose SOURCE path name matches `deny` (returns false,
    * the contract under test). Everything else passes through to local FS.
    */
  private class DenyingFs(underlying: FileSystem, deny: String => Boolean) extends FilterFileSystem(underlying) {
    val denied = new java.util.concurrent.atomic.AtomicInteger
    override def rename(src: Path, dst: Path): Boolean =
      if (deny(src.toString)) { denied.incrementAndGet(); false }
      else super.rename(src, dst)
  }

  test("failed swap rename throws and preserves the previous table state") {
    val root = java.nio.file.Files.createTempDirectory("graft-commit").toString
    @volatile var deny = false
    var fsRef: DenyingFs = null
    val sink = new ParquetUpsertSink(root) {
      override protected def hfs(spark: org.apache.spark.sql.SparkSession, path: String): FileSystem = {
        if (fsRef == null) fsRef = new DenyingFs(super.hfs(spark, path), p => deny && p.endsWith(".tmp"))
        fsRef
      }
    }
    sink.write(id, batch((1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 2L)), schema)
    assert(sink.read(spark, id).count() === 2)

    deny = true // the tmp -> live swap will fail; old state must be restored
    val e = intercept[java.io.IOException] {
      sink.write(id, batch((3L, "c", "INSERT", 3L)), schema)
    }
    assert(e.getMessage.contains("commit failed"))
    assert(fsRef.denied.get() > 0, "injected rename failure never hit")
    assert(sink.read(spark, id).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")), "previous state must survive a failed commit")

    deny = false // obstruction clears: the replayed batch commits (idempotent)
    sink.write(id, batch((3L, "c", "INSERT", 3L)), schema)
    assert(sink.read(spark, id).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    val _ = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(root), true)
  }

  test("bucketed swap failure restores the displaced bucket") {
    val root = java.nio.file.Files.createTempDirectory("graft-commit-b").toString
    @volatile var deny = false
    var fsRef: DenyingFs = null
    val sink = new ParquetUpsertSink(root, buckets = 4) {
      override protected def hfs(spark: org.apache.spark.sql.SparkSession, path: String): FileSystem = {
        // deny the swap-IN of new bucket data (src under .tmp/__bucket=) but
        // allow the displace (src = live bucket) and the restore (src = .old_)
        if (fsRef == null) fsRef = new DenyingFs(super.hfs(spark, path),
          p => deny && p.contains(".tmp/__bucket="))
        fsRef
      }
    }
    sink.write(id, batch((1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 2L),
      (3L, "c", "INSERT", 3L), (4L, "d", "INSERT", 4L)), schema)
    val before = sink.read(spark, id).as[(Long, String)].collect().toSet
    assert(before === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    deny = true
    intercept[java.io.IOException] {
      sink.write(id, batch((1L, "a2", "UPDATE", 9L)), schema)
    }
    assert(fsRef.denied.get() > 0, "injected rename failure never hit")
    deny = false
    assert(sink.read(spark, id).as[(Long, String)].collect().toSet === before,
      "displaced bucket must be restored after a failed swap")

    sink.write(id, batch((1L, "a2", "UPDATE", 9L)), schema)
    assert(sink.read(spark, id).as[(Long, String)].collect().toSet ===
      Set((1L, "a2"), (2L, "b"), (3L, "c"), (4L, "d")))
    val _ = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(root), true)
  }

  test("crash between the two swap renames is recovered, not destroyed") {
    val root = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val sink = new ParquetUpsertSink(root)
    sink.write(id, batch((1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 2L)), schema)

    // simulate a process death between rename(dst -> old) and
    // rename(tmp -> dst): the only copy of table state sits under .old
    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(sink.tablePath(id))
    assert(fs.rename(dst, new Path(sink.tablePath(id) + ".old")))
    assert(!fs.exists(dst))

    // next write must restore .old first — treating the table as empty
    // would silently drop keys 1 and 2
    sink.write(id, batch((3L, "c", "INSERT", 3L)), schema)
    assert(sink.read(spark, id).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(!fs.exists(new Path(sink.tablePath(id) + ".old")))
    val _ = fs.delete(new Path(root), true)
  }

  test("crash with a displaced bucket under .tmp is recovered on next write") {
    val root = java.nio.file.Files.createTempDirectory("graft-crash-b").toString
    val sink = new ParquetUpsertSink(root, buckets = 4)
    sink.write(id, batch((1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 2L),
      (3L, "c", "INSERT", 3L), (4L, "d", "INSERT", 4L)), schema)

    // find a live bucket and displace it the way a mid-swap crash would:
    // bucket dir moved to .tmp/.old_N, replacement never swapped in
    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val tablePath = sink.tablePath(id)
    val liveBucket = fs.listStatus(new Path(tablePath))
      .map(_.getPath.getName).filter(_.startsWith("__bucket=")).head
    val b = liveBucket.stripPrefix("__bucket=")
    assert(fs.mkdirs(new Path(s"$tablePath.tmp")))
    assert(fs.rename(new Path(s"$tablePath/$liveBucket"), new Path(s"$tablePath.tmp/.old_$b")))

    // next write (touching any bucket) must first restore the displaced one;
    // before recovery the overwrite of .tmp would destroy its only copy
    sink.write(id, batch((1L, "a2", "UPDATE", 9L)), schema)
    assert(sink.read(spark, id).as[(Long, String)].collect().toSet ===
      Set((1L, "a2"), (2L, "b"), (3L, "c"), (4L, "d")))
    val _ = fs.delete(new Path(root), true)
  }

  test("swap_ready tmp is rolled FORWARD: crash mid-swap applies the batch, once") {
    val root = java.nio.file.Files.createTempDirectory("graft-fwd").toString
    val sink = new ParquetUpsertSink(root, buckets = 4)
    sink.write(id, batch((1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 2L),
      (3L, "c", "INSERT", 3L), (4L, "d", "INSERT", 4L)), schema)

    // simulate a crash between the parquet write (complete, marker created)
    // and the swaps: tmp holds the batch's full output for one bucket
    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val tablePath = sink.tablePath(id)
    val liveBucket = fs.listStatus(new Path(tablePath))
      .map(_.getPath.getName).filter(_.startsWith("__bucket=")).head
    assert(fs.mkdirs(new Path(s"$tablePath.tmp")))
    // the "new" bucket content = a copy of a DIFFERENT live bucket's dir,
    // moved under tmp as the would-be replacement of liveBucket
    val other = fs.listStatus(new Path(tablePath))
      .map(_.getPath.getName).filter(_.startsWith("__bucket=")).apply(1)
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$tablePath/$other"), new java.io.File(s"$tablePath.tmp/$liveBucket"))
    assert(fs.mkdirs(new Path(s"$tablePath.tmp/.swap_ready")))

    // read-path recovery must displace the live bucket, swap the tmp copy in,
    // and clean tmp — the batch applies exactly once, forward
    val expectOther = spark.read.parquet(s"$tablePath/$other")
      .drop("__bucket").as[(Long, String)].collect().toSet
    val recovered = sink.read(spark, id)
    val inBucket = spark.read.parquet(s"$tablePath/$liveBucket")
      .as[(Long, String)].collect().toSet
    assert(inBucket === expectOther, "tmp replacement must be swapped in forward")
    assert(!fs.exists(new Path(s"$tablePath.tmp")), "tmp must be cleaned after roll-forward")
    assert(recovered.count() > 0)
  }

  test("swap_ready roll-forward does not resurrect a displaced emptied bucket") {
    val root = java.nio.file.Files.createTempDirectory("graft-fwd-e").toString
    val sink = new ParquetUpsertSink(root, buckets = 4)
    sink.write(id, batch((1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 2L),
      (3L, "c", "INSERT", 3L), (4L, "d", "INSERT", 4L)), schema)

    // crash after an emptied bucket's displace, marker present, no
    // replacement dir in tmp: roll-forward must leave dst absent
    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val tablePath = sink.tablePath(id)
    val liveBucket = fs.listStatus(new Path(tablePath))
      .map(_.getPath.getName).filter(_.startsWith("__bucket=")).head
    val b = liveBucket.stripPrefix("__bucket=")
    val before = sink.read(spark, id).as[(Long, String)].collect().toSet
    assert(fs.mkdirs(new Path(s"$tablePath.tmp")))
    assert(fs.mkdirs(new Path(s"$tablePath.tmp/.swap_ready")))
    assert(fs.rename(new Path(s"$tablePath/$liveBucket"), new Path(s"$tablePath.tmp/.old_$b")))

    val after = sink.read(spark, id).as[(Long, String)].collect().toSet
    assert(after.subsetOf(before) && after.size < before.size,
      "emptied bucket must stay deleted under roll-forward recovery")
    assert(!fs.exists(new Path(s"$tablePath.tmp")))
  }

  test("AutoBuckets derives the layout from the first batch and pins it in meta") {
    val root = java.nio.file.Files.createTempDirectory("graft-auto").toString
    val sink = new ParquetUpsertSink(root, buckets = ParquetUpsertSink.AutoBuckets)
    sink.write(id, batch((1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 2L)), schema)

    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val tablePath = sink.tablePath(id)
    val meta = new Path(tablePath + ".layout")
    assert(fs.exists(meta), "layout meta must be written at state creation")
    val in = fs.open(meta)
    val m = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt finally in.close()
    assert(m === 1, "a 2-row first batch derives a single bucket")
    assert(fs.listStatus(new Path(tablePath))
      .count(_.getPath.getName.startsWith("__bucket=")) === 1)

    // a second writer with a DIFFERENT constructor constant must follow the
    // on-disk layout (meta wins), not prune state with the wrong modulus
    val sink2 = new ParquetUpsertSink(root, buckets = 32)
    sink2.write(id, batch((3L, "c", "INSERT", 3L)), schema)
    assert(sink2.read(spark, id).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(fs.listStatus(new Path(tablePath))
      .count(_.getPath.getName.startsWith("__bucket=")) === 1,
      "the merge must keep the meta's 1-bucket layout, not fan out to 32")
    val _ = fs.delete(new Path(root), true)
  }

  test("displaced bucket WITH a done marker (emptied by deletes) is not resurrected") {
    val root = java.nio.file.Files.createTempDirectory("graft-crash-d").toString
    val sink = new ParquetUpsertSink(root, buckets = 4)
    sink.write(id, batch((1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 2L),
      (3L, "c", "INSERT", 3L), (4L, "d", "INSERT", 4L)), schema)

    // simulate a crash AFTER an emptied bucket's swap decision completed
    // (marker written, tmp not yet cleaned): dst absent by design
    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val tablePath = sink.tablePath(id)
    val liveBucket = fs.listStatus(new Path(tablePath))
      .map(_.getPath.getName).filter(_.startsWith("__bucket=")).head
    val b = liveBucket.stripPrefix("__bucket=")
    val before = sink.read(spark, id).as[(Long, String)].collect().toSet
    assert(fs.mkdirs(new Path(s"$tablePath.tmp")))
    assert(fs.rename(new Path(s"$tablePath/$liveBucket"), new Path(s"$tablePath.tmp/.old_$b")))
    assert(fs.mkdirs(new Path(s"$tablePath.tmp/.done_$b")))

    val after = sink.read(spark, id).as[(Long, String)].collect().toSet
    assert(after.subsetOf(before) && after.size < before.size,
      "marker-completed deletion must stay deleted on read and write")
    sink.write(id, batch((5L, "e", "INSERT", 10L)), schema)
    assert(sink.read(spark, id).as[(Long, String)].collect().toSet === after + ((5L, "e")))
    val _ = fs.delete(new Path(root), true)
  }
}
