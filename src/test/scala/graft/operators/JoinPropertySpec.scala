package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests: the scalable join operators must agree with brute-force
  * reference semantics on randomized inputs (fixed seeds — deterministic).
  */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("AsOfJoin.backward agrees with brute force on random keyed series") {
    for (round <- 1 to 3) {
      val keys = Seq("a", "b", "c", "d")
      val lefts = Seq.fill(120)((keys(rnd.nextInt(4)), rnd.nextInt(1000).toLong, rnd.nextLong()))
      val rights = Seq.fill(80)((keys(rnd.nextInt(4)), rnd.nextInt(1000).toLong, rnd.nextLong()))
        // unique (key, t) on the right: with ties the matched payload is
        // arbitrary among equals in ANY implementation
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

      val l = lefts.toDF("k", "t", "lv")
      val r = rights.toDF("k", "t", "rv")
      val got = AsOfJoin.backward(l, r, on = "t", by = Seq("k"))
        .select("k", "t", "lv", "rv")
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) None else Some(x.getLong(3)))).toSeq.sorted

      val expected = lefts.map { case (k, t, lv) =>
        val m = rights.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption.map(_._3)
        (k, t, lv, m)
      }.sorted
      assert(got === expected, s"round $round")
    }
  }

  test("RangeJoin.binned agrees with brute force on random windows") {
    for ((lower, upper) <- Seq((-50L, 0L), (-30L, 30L), (10L, 90L))) {
      val lefts = Seq.fill(100)((rnd.nextLong().abs % 100000, rnd.nextInt(2000).toLong))
      val rights = Seq.fill(100)((rnd.nextLong().abs % 100000, rnd.nextInt(2000).toLong))
      val l = lefts.toDF("lid", "t")
      val r = rights.toDF("rid", "t")
      val got = RangeJoin.binned(l, r, on = "t", lower = lower, upper = upper)
        .select("lid", "r_rid")
        .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .toSeq.sorted

      val expected = lefts.flatMap { case (lid, lt) =>
        val ms = rights.filter { case (_, rt) => rt > lt + lower && rt <= lt + upper }
        if (ms.isEmpty) Seq((lid, None: Option[Long]))
        else ms.map { case (rid, _) => (lid, Some(rid)) }
      }.sorted
      assert(got === expected, s"window ($lower, $upper]")
    }
  }

  test("Sessionize.sessions partitions events exactly at gap boundaries") {
    for (gap <- Seq(10L, 50L, 200L)) {
      val evs = Seq.fill(200)((rnd.nextInt(3).toLong, rnd.nextInt(2000).toLong)).distinct
      val got = Sessionize.sessions(evs.toDF("k", "t"), "k", "t", gap)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
        .sortBy(x => (x._1, x._3))

      val expected = evs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val ts = rows.map(_._2).distinct.sorted
        val sessions = ts.foldLeft(List.empty[List[Long]]) {
          case (Nil, t) => List(List(t))
          case (cur :: done, t) if t - cur.head <= gap => (t :: cur) :: done
          case (acc, t) => List(t) :: acc
        }.map(_.reverse).reverse
        sessions.map(s => (k, s.size.toLong, s.head, s.last))
      }.sortBy(x => (x._1, x._3))
      assert(got === expected, s"gap $gap")
    }
  }
}
