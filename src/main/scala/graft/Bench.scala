package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout (driver contract).
  *
  * Reports per-query wall seconds plus the three BASELINE.md §"Bench target"
  * throughput anchors: snapshot-load rows/sec into the upsert sink
  * (`upsert_rps`, comparable to the reference's DsqlBatchSinkFunction RPS
  * logs), end-to-end transform throughput (`transform_rps`), and micro-batch
  * latency for a 1k-event batch (`microbatch_sec` vs the reference's 30 s
  * batch-timeout operating point).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // JVM/codegen warmup so per-query numbers measure the engine, not JIT
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // A query that throws is SURFACED in an `errors` map and excluded from
    // the timings — a -1 s sentinel folded into `total` (the old behavior)
    // reads as a fast query, not a broken one.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timedOrError(name: String)(f: => Unit): Option[Double] =
      try Some(time(f)._2)
      catch {
        case e: Throwable =>
          errors(name) = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).take(300)
          None
      }

    // one untimed warmup run per query (JIT, codegen cache, page cache), then
    // median of three timed runs: round-4 showed 5x same-code swings under
    // single-shot timing (q_embed_ivf_topk 0.82s vs 4.01s), which makes a 2x
    // perf gate unadjudicable — the median absorbs GC/JIT outliers both ways.
    // A band whose max/min exceeds 3x is remeasured once (round-7's
    // q_startup_timestamp shipped a poisoned median with exactly that
    // signature) and the tighter of the two triples is reported.
    val reran = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => SparkEntry.launchBoundE2e(q._1))
      .flatMap { case (name, fn) =>
        def once(): Option[Double] = timedOrError(name) { fn(spark, sfDir).count(); () }
        once() // warmup
        def triple(): Option[Seq[Double]] =
          if (errors.contains(name)) None
          else {
            val rs = (1 to 3).map(_ => once())
            if (rs.exists(_.isEmpty)) None else Some(rs.flatten.sorted)
          }
        def spread(t: Seq[Double]): Double = t.last / math.max(t.head, 1e-9)
        triple().flatMap { t1 =>
          if (spread(t1) > 3.0) {
            reran += name
            triple() match {
              case Some(t2) => Some(if (spread(t2) < spread(t1)) t2 else t1)
              case None =>
                // the REMEASURE flaked, but four successful timed runs exist —
                // keep the valid first triple instead of degrading a wide band
                // into a hard error
                errors.remove(name)
                Some(t1)
            }
          } else Some(t1)
        }.map(bands => (name, bands))
      }

    // composed e2e control-path rows: launch-overhead-bound (sf-invariant),
    // run once each and reported OUTSIDE the throughput total — see
    // SparkEntry.launchBoundE2e
    val e2e = SparkEntry.launchBoundE2e.toSeq.sorted.flatMap { name =>
      timedOrError(name) { SparkEntry.queries(name)(spark, sfDir).count(); () }
        .map(sec => (name, sec))
    }

    def median3(f: => Double): Double = (1 to 3).map(_ => f).sorted.apply(1)

    // throughput anchors (queries already warmed by the loop above)
    val lineitemRows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val tTransform = median3 {
      time { SparkEntry.queries("q_transform_computed")(spark, sfDir).count() }._2
    }
    val transformRps = lineitemRows / math.max(tTransform, 1e-9)

    val eventRows = spark.read.parquet(s"$sfDir/events.parquet").count()
    val tUpsert = median3 {
      time { SparkEntry.queries("q_stream_pipeline")(spark, sfDir).count() }._2
    }
    val upsertRps = eventRows / math.max(tUpsert, 1e-9)

    // micro-batch latency: 1000-event debezium batch through the full pipeline
    val microbatchSec = {
      import graft.model._
      import org.apache.spark.sql.functions._
      val srcId = TableId.of("db", "events")
      val schema = CdcSchema.of("user_id" -> "BIGINT", "event_type" -> "STRING", "value" -> "DOUBLE")
        .copy(primaryKeys = Seq("user_id"))
      val out = java.nio.file.Files.createTempDirectory("graft-bench-mb").toString
      val sink = new graft.sinks.ParquetUpsertSink(out, buckets = 32)
      val pipe = new graft.streaming.StreamingPipeline(new graft.operators.SchemaRegistry(), sink = sink)
      pipe.applySchemaChange(CreateTableEvent(srcId, schema))
      val batch = graft.sinks.ChangelogJson.debezium(
        spark.read.parquet(s"$sfDir/events.parquet").limit(1000).select(
          col("user_id"), col("event_type"), col("value"),
          lit("REPLACE").as(graft.operators.Changelog.OpCol),
          col("event_id").as(graft.operators.Changelog.SeqCol)), srcId).cache()
      batch.count()
      val (_, t0) = time { pipe.processBatch(batch, 0L) } // initial load
      // steady-state merge, median of three batches
      val t1 = median3 { time { pipe.processBatch(batch, 1L) }._2 }
      math.min(t0, t1)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    val qs = results.map { case (k, v) => jstr(k) + ":" + v(1) }.mkString("{", ",", "}")
    // per-query [min, median, max] of the 3 timed runs: round-6 reported a
    // 3.5x "regression" on q_dedup_ngram that round-7 could not reproduce
    // (machine-load noise during the driver run) — the bands let future
    // rounds separate noise from signal without archaeology
    val bands = results.map { case (k, v) =>
      jstr(k) + ":[" + v.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2.apply(1)).sum
    val e2eJson = e2e.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val reranJson = reran.map(jstr).mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""query_bands":$bands,"e2e_untimed_sec":$e2eJson,""" +
      s""""errors":$errJson,"reran":$reranJson,""" +
      s""""transform_rps":${transformRps.round},"upsert_rps":${upsertRps.round},""" +
      s""""microbatch_sec":$microbatchSec,"sf":"$sfDir"}"""
    // scalastyle:off println
    println(line)
    // scalastyle:on
    // ALSO persist the record: round-7's stdout tail capture truncated 65 of
    // 79 per-query numbers — a file copy makes the record loss-proof
    try {
      val p = java.nio.file.Paths.get("target/bench-latest.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, line + "\n")
      ()
    } catch { case _: Exception => () } // stdout line already carries the record
    spark.stop()
  }
}
