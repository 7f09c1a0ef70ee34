package graft

import org.apache.spark.sql.SparkSession

/** Super-linearity probe: run the timed query set ONCE at a larger scale
  * factor and compare each wall time against `factor ×` the committed
  * sf0.1 medians — the cheapest way to catch a quadratic shape the sf0.1
  * gate structurally cannot see (a candidate explosion, an accidental
  * cross join, a per-key buffer that grows with corpus size).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<scaledDir> runMain graft.ScaleProbe [factor=10] [query...]
  * (trailing query names restrict the run — the per-fix re-measure loop)
  *
  * One untimed warmup run per query (codegen/JIT, and the once-per-JVM
  * shared index builds land there, exactly as in Bench), then ONE timed
  * run — medians-of-three would triple an already-long probe for noise
  * margins the flag rule doesn't need. Flags on ratio AND absolute
  * excess — `t > 2 × linear + 1 s` where `linear = factor × sf0.1
  * median` — tighter than the round brief's 10× bar, loose enough that
  * single-run noise on sub-second queries cannot flag. Writes
  * `target/scale-probe.json`; flagged queries get a SCALE.md diagnosis.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    // the factor really is optional before trailing query names: a
    // non-numeric first arg starts the query list
    val (factor, queryArgs) =
      args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption) match {
        case Some(f) => (f, args.drop(1))
        case None => (10, args)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val prev = Bench.loadPrevMedians(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", "bench-prev.json")))

    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // JVM warmup

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val only = queryArgs.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => SparkEntry.launchBoundE2e(q._1))
      .filter(q => only.isEmpty || only(q._1))
      .flatMap { case (name, fn) =>
        try {
          fn(spark, sfDir).count() // untimed warmup (JIT + shared caches)
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          // scalastyle:off println
          println(f"  $name%-28s $sec%8.2f s  (linear ${prev.get(name).fold("?")(p => f"${factor * p}%.2f")})")
          // scalastyle:on
          Some(name -> sec)
        } catch {
          case e: Throwable =>
            errors(name) = (e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage)).take(300)
            None
        }
      }

    val flags = results.flatMap { case (name, sec) =>
      prev.get(name).collect {
        case p if sec > 2.0 * factor * p + 1.0 =>
          name -> (sec, factor * p)
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jnum(d: Double): String = f"$d%.3f"
    val qs = results.map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}")
    val fl = flags.map { case (k, (t, lin)) =>
      jstr(k) + ":{\"sec\":" + jnum(t) + ",\"linear\":" + jnum(lin) + "}"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"scale_probe","factor":$factor,"total_sec":${jnum(total)},""" +
      s""""n_queries":${results.size},"queries":$qs,"flags":$fl,"errors":$errJson,""" +
      s""""sf":"$sfDir"}"""
    // scalastyle:off println
    println(line)
    // scalastyle:on
    try {
      val p = java.nio.file.Paths.get("target/scale-probe.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, line + "\n")
      ()
    } catch { case _: Exception => () }
    spark.stop()
  }
}
