package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("redact replaces emails, phones and IPs; counts match") {
    val df = Seq(
      "reach me at bob@example.com or 25-989-741-2988",
      "server 10.0.12.3 crashed",
      "nothing sensitive here").toDF("text")
      .select(Pii.redact(col("text")).as("clean"), Pii.piiCount(col("text")).as("n"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(
      ("reach me at <EMAIL> or <PHONE>", 2L),
      ("server <IP> crashed", 1L),
      ("nothing sensitive here", 0L)))
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 10000L).toDF("id")

  test("hash sample hits the target rate and is deterministic") {
    val n1 = Sampling.hashSample(ids, col("id"), 0.25).count()
    val n2 = Sampling.hashSample(ids.repartition(7), col("id"), 0.25).count()
    assert(n1 === n2)                       // stable under re-partitioning
    assert(math.abs(n1 - 2500.0) < 200)     // ±4σ of binomial(10000, .25)
  }

  test("nested rates: a 10% sample is a subset of the 25% sample") {
    val s25 = Sampling.hashSample(ids, col("id"), 0.25).select("id").as[Long].collect().toSet
    val s10 = Sampling.hashSample(ids, col("id"), 0.10).select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s25))
  }

  test("edge rates keep all / none") {
    assert(Sampling.hashSample(ids, col("id"), 1.0).count() === 10000)
    assert(Sampling.hashSample(ids, col("id"), 0.0).count() === 0)
  }

  test("stratified applies per-stratum rates with a default") {
    val df = ids.withColumn("s", when(col("id") < 5000, "a").otherwise("b"))
    val out = Sampling.stratified(df, col("id"), col("s"), Map("a" -> 0.2), defaultRate = 1.0)
    val byS = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("b") === 5000)
    assert(math.abs(byS("a") - 1000.0) < 150)
  }

  test("keepWeighted with a constant rate equals keep; out-of-range rates clamp") {
    val const = Sampling.weightedSample(ids, col("id"), lit(0.3))
      .select("id").as[Long].collect().toSet
    val uniform = Sampling.hashSample(ids, col("id"), 0.3)
      .select("id").as[Long].collect().toSet
    assert(const === uniform) // identical threshold math per row
    assert(Sampling.weightedSample(ids, col("id"), lit(1.5)).count() === 10000)
    assert(Sampling.weightedSample(ids, col("id"), lit(-0.2)).count() === 0)
  }

  test("weighted sampling drops NULL-rate rows; coalesce opts into a default") {
    val scored = ids.withColumn("r",
      when(col("id") < 100, lit(null).cast("double")).otherwise(lit(1.0)))
    // documented null stance: null score → dropped (like keep's null key)
    assert(Sampling.weightedSample(scored, col("id"), col("r")).count() === 9900)
    // callers choose a different policy explicitly
    assert(Sampling.weightedSample(scored, col("id"),
      coalesce(col("r"), lit(1.0))).count() === 10000)
  }

  test("weighted sampling is nested: rows kept at a lower score stay kept at a higher one") {
    val low = Sampling.weightedSample(ids, col("id"), lit(0.2))
      .select("id").as[Long].collect().toSet
    val high = Sampling.weightedSample(ids, col("id"), lit(0.6))
      .select("id").as[Long].collect().toSet
    assert(low.subsetOf(high))
  }

  test("rebalance: binding stratum kept whole, others downsampled to the target mix") {
    // a:2000 (w .5), b:8000 (w .5) → budget = min(4000, 16000) → a whole,
    // b at rate .5*4000/8000 = .25 → surviving mix ~50/50
    val df = ids.withColumn("s", when(col("id") < 2000, "a").otherwise("b"))
    val out = Sampling.rebalance(df, col("id"), col("s"), Map("a" -> 0.5, "b" -> 0.5))
    val byS = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("a") === 2000)                   // binding stratum: rate exactly 1
    assert(math.abs(byS("b") - 2000.0) < 200)   // ±4σ of binomial(8000, .25)
    // deterministic under re-partitioning
    assert(out.count() ===
      Sampling.rebalance(df.repartition(13), col("id"), col("s"),
        Map("a" -> 0.5, "b" -> 0.5)).count())
  }

  test("cluster-balanced curation: rebalance over k-means clusters evens the mix") {
    // the q_cluster_balance composition: assign embeddings to centroids,
    // rebalance to a uniform cluster mix — the dominant cluster must lose
    // share and the output mix must be closer to uniform than the input
    val dim = 8
    val vecs = (0 until 400).map { i =>
      // 300 vectors near one direction (a dominant semantic neighborhood),
      // 100 spread elsewhere
      val base = if (i < 300) Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.01f * (i % 7))
                 else Array.tabulate(dim)(d => ((Dedup.mix64(i.toLong * 13 + d) % 1000) / 1000.0f))
      (i.toLong, base)
    }
    val df = vecs.toDF("id", "v")
    val model = Ivf.train(df, "id", "v", k = 4, iters = 2)
    val assigned = Ivf.assign(df, "id", "v", model)
    val uniform = (0 until 4).map(c => c.toString -> 0.25).toMap
    val out = Sampling.rebalance(assigned, col("id"), col("centroid_id"), uniform)
    def spread(d: org.apache.spark.sql.DataFrame): Double = {
      val counts = d.groupBy("centroid_id").count().collect().map(_.getLong(1).toDouble)
      counts.max / counts.min
    }
    assert(spread(out) < spread(assigned)) // strictly closer to uniform
    assert(out.count() < assigned.count()) // the dominant cluster was cut
  }

  test("rebalance drops unlisted strata and ignores empty target strata") {
    val df = ids.withColumn("s", when(col("id") < 2000, "a").otherwise("junk"))
    val out = Sampling.rebalance(df, col("id"), col("s"),
      Map("a" -> 0.5, "ghost" -> 0.5)) // ghost has no rows: excluded from budget
    val byS = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS === Map("a" -> 2000L)) // junk dropped, a kept whole
  }

  test("temperatureRebalance: alpha=1 keeps the natural mix whole") {
    val df = ids.withColumn("s", when(col("id") < 2000, "a").otherwise("b"))
    // q_d = n_d / N: every stratum is binding, all rates are exactly 1
    assert(Sampling.temperatureRebalance(df, col("id"), col("s"), alpha = 1.0)
      .count() === 10000L)
  }

  test("temperatureRebalance: alpha<1 upweights the low-resource stratum") {
    // a:1000, b:9000; alpha=.5 → q ∝ (√1000, √9000) = 1:3 — a is binding
    // and kept whole, b downsamples to 3x a's share (3000), not 9x
    val df = ids.withColumn("s", when(col("id") < 1000, "a").otherwise("b"))
    val out = Sampling.temperatureRebalance(df, col("id"), col("s"), alpha = 0.5)
    val byS = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("a") === 1000)
    assert(math.abs(byS("b") - 3000.0) < 250, byS) // ±4σ of binomial(9000, 1/3)
    // deterministic under re-partitioning
    assert(out.count() ===
      Sampling.temperatureRebalance(df.repartition(13), col("id"), col("s"), 0.5).count())
  }

  test("codePointOrder matches binary UTF-8 collation where UTF-16 code units diverge") {
    // a supplementary-plane character (U+1F600, surrogate pair D83D DE00)
    // sorts BELOW U+FFFD under Java's default code-unit order but ABOVE
    // it by code points — the order DuckDB's binary collation (UTF-8
    // bytes) uses. The mix fold's Z-sum order must match the oracle's.
    val emoji = new String(Character.toChars(0x1F600))
    assert(emoji.compareTo("�") < 0) // the Java default order trap
    assert(Sampling.codePointOrder.compare(emoji, "�") > 0)
    assert(Sampling.codePointOrder.compare("�", emoji) < 0)
    // agreement with UTF-8 byte order on a mixed sample, prefixes included
    val strs = Seq("", "a", "ab", "aB", "z", "é", "�", emoji,
      emoji + "a", "a" + emoji, "")
    def utf8Lt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
    }
    assert(strs.sorted(Sampling.codePointOrder) ===
      strs.sortWith(utf8Lt))
    // ASCII strata (every stratum in the test corpus) are order-identical
    // to the Java default — the fix is invisible there by construction
    val ascii = Seq("src2", "src1", "a", "B", "src10")
    assert(ascii.sorted(Sampling.codePointOrder) === ascii.sorted)
  }

  test("temperatureRebalance drops NULL-stratum rows and excludes them from the mix") {
    val df = ids.withColumn("s", when(col("id") < 2000, "a")
      .when(col("id") < 4000, lit(null).cast("string")).otherwise("b"))
    val out = Sampling.temperatureRebalance(df, col("id"), col("s"), alpha = 0.5)
    assert(out.where(col("s").isNull).count() === 0L)
  }

  test("fixedPerStratum: exactly min(k, |stratum|) rows, stable under repartitioning") {
    // skewed strata: a=5000, b=100, c=3 — rate-based sampling cannot give
    // exact per-stratum sizes here; rank-based must
    val df = ids.withColumn("s", when(col("id") < 5000, "a")
      .when(col("id") < 5100, "b").otherwise(when(col("id") < 5103, "c")))
      .where(col("s").isNotNull)
    val out = Sampling.fixedPerStratum(df, col("id"), col("s"), k = 50)
    val sizes = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(sizes === Map("a" -> 50L, "b" -> 50L, "c" -> 3L))
    val again = Sampling.fixedPerStratum(df.repartition(17), col("id"), col("s"), k = 50)
    assert(out.select("id").as[Long].collect().toSet ===
      again.select("id").as[Long].collect().toSet)
    // the rank<=k filter must plan as WindowGroupLimit (per-partition
    // heaps before the exchange), not a full per-stratum sort + filter
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
