package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The changelog algebra on random changelogs: [[Changelog.mergeHistory]]
  * must equal the full recompute at EVERY split point, [[Changelog.diff]]
  * must be minimal and round-trip. These are the invariants the oracle
  * queries check on one fixture shape; random keys/ops/payloads cover the
  * branch space (delete-first batches, re-inserts, key churn, null
  * payloads).
  */
class ChangelogPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(23)

  private def randomChangelog(nEvents: Int, nKeys: Int): Seq[(String, String, String, Long)] =
    (1 to nEvents).map { seq =>
      val k = s"k${rnd.nextInt(nKeys)}"
      val op = if (rnd.nextInt(5) == 0) "DELETE" else "REPLACE"
      val v = if (rnd.nextInt(10) == 0) null else s"v${rnd.nextInt(6)}"
      (k, v, op, seq.toLong)
    }

  test("mergeHistory == full recompute on random changelogs at random splits") {
    for (trial <- 1 to 4) {
      val events = randomChangelog(nEvents = 60, nKeys = 7)
      val ch = events.toDF("k", "v", Changelog.OpCol, Changelog.SeqCol)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), Option(r.getString(1)),
          r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      val full = canon(Changelog.history(ch, Seq("k")))
      for (_ <- 1 to 3) {
        val split = 1L + rnd.nextInt(59)
        val merged = canon(Changelog.mergeHistory(
          Changelog.history(ch.where(col(Changelog.SeqCol) <= split), Seq("k")),
          ch.where(col(Changelog.SeqCol) > split), Seq("k")))
        assert(merged === full, s"trial=$trial split=$split")
      }
    }
  }

  test("mergeAggregate == full recompute on random numeric changelogs at random splits") {
    // random key churn, group moves, deletes emptying groups, null dims
    // excluded by the fixture (documented SQL-equality alignment)
    for (trial <- 1 to 4) {
      val events = (1 to 70).map { seq =>
        val k = rnd.nextInt(9).toLong
        val g = s"g${rnd.nextInt(4)}"
        val v = rnd.nextInt(2000) / 100.0
        val op = if (rnd.nextInt(6) == 0) "DELETE" else "REPLACE"
        (k, g, v, op, seq.toLong)
      }
      val ch = events.toDF("k", "g", "v", Changelog.OpCol, Changelog.SeqCol)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).stripTrailingZeros)).toSet
      val full = canon(Changelog.aggregate(
        Changelog.materialize(ch, Seq("k")), Seq("g"), Seq("v")))
      for (_ <- 1 to 3) {
        val split = 1L + rnd.nextInt(69)
        val state = Changelog.materialize(
          ch.where(col(Changelog.SeqCol) <= split), Seq("k"))
        val merged = canon(Changelog.mergeAggregate(
          Changelog.aggregate(state, Seq("g"), Seq("v")), state,
          ch.where(col(Changelog.SeqCol) > split), Seq("k"), Seq("g"), Seq("v")))
        assert(merged === full, s"trial=$trial split=$split")
      }
    }
  }

  test("temporalJoin == naive per-probe interval scan on random histories") {
    for (trial <- 1 to 4) {
      val events = randomChangelog(nEvents = 50, nKeys = 6)
      val ch = events.toDF("k", "v", Changelog.OpCol, Changelog.SeqCol)
      val hist = Changelog.history(ch, Seq("k"))
      val probes = (1 to 30).map(i => (s"k${rnd.nextInt(8)}", rnd.nextInt(55).toLong))
        .distinct.toDF("k", "at")
      val got = Changelog.temporalJoin(probes, hist, Seq("k"), col("at"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
      // naive single-node reference: scan the interval list per probe
      val intervals = hist.collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getLong(2), if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      val expected = probes.collect().map { p =>
        val (k, at) = (p.getString(0), p.getLong(1))
        val cover = intervals.filter(iv => iv._1 == k && iv._3 <= at && iv._4 > at)
        assert(cover.length <= 1, s"trial=$trial overlapping intervals for $k@$at")
        // None conflates no-match with null-payload-match, matching the
        // DataFrame view of both as a null column
        (k, at, cover.headOption.flatMap(_._2))
      }.toSet
      assert(got === expected, s"trial=$trial")
    }
  }

  test("diff is minimal and round-trips on random snapshot pairs") {
    for (trial <- 1 to 4) {
      val ch = randomChangelog(nEvents = 80, nKeys = 12)
        .toDF("k", "v", Changelog.OpCol, Changelog.SeqCol)
      val split = 20L + rnd.nextInt(40)
      val oldS = Changelog.materialize(ch.where(col(Changelog.SeqCol) <= split), Seq("k"))
      val newS = Changelog.materialize(ch, Seq("k"))
      val d = Changelog.diff(oldS, newS, Seq("k"))

      // minimality: no emitted row may be an unchanged (old == new) pair
      val oldM = oldS.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      val newM = newS.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      d.collect().foreach { r =>
        val (k, op) = (r.getString(0), r.getString(2))
        op match {
          case "INSERT" => assert(!oldM.contains(k) && newM.contains(k), s"trial=$trial $k")
          case "DELETE" => assert(oldM.contains(k) && !newM.contains(k), s"trial=$trial $k")
          case "UPDATE" => assert(oldM.contains(k) && newM.contains(k) &&
            oldM(k) != newM(k), s"trial=$trial $k")
        }
      }
      // completeness via round-trip: old + diff rebuilds new exactly
      val rebuilt = Changelog.materialize(
        Changelog.fromSnapshot(oldS, lit(0L)).unionByName(
          d.withColumn(Changelog.SeqCol, lit(1L))
            .withColumn(Changelog.OpCol,
              when(col(Changelog.OpCol) === "DELETE", "DELETE").otherwise("REPLACE"))),
        Seq("k"))
        .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
      val target = newS.collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(rebuilt === target, s"trial=$trial")
    }
  }
}
