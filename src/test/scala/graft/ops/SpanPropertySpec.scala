package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** [[Dedup.spanProfile]] against an independent naive reimplementation
  * (string windows, distinct-doc rule, interval union — Scala collections,
  * no shared code with the distributed hash/fold pipeline) on random
  * small-vocab corpora, where cross-doc span collisions are dense and
  * overlap patterns are adversarial.
  */
class SpanPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)

  private def naive(docs: Seq[(Long, String)], k: Int): Map[Long, (Int, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    }.toMap
    val windows = toks.toSeq.flatMap { case (id, tk) =>
      if (tk.length < k) Nil
      else (0 to tk.length - k).map(i => (tk.slice(i, i + k).mkString(" "), id, i))
    }
    val dupWins = windows.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
    val coveredByDoc = windows.filter(w => dupWins(w._1))
      .groupBy(_._2)
      .map { case (id, ws) =>
        id -> ws.flatMap(w => w._3 until w._3 + k).distinct.size.toLong
      }
    toks.map { case (id, tk) => id -> (tk.length, coveredByDoc.getOrElse(id, 0L)) }
  }

  test("spanProfile equals the naive reference on random dense-collision corpora") {
    for (trial <- 1 to 3) {
      val k = 3 + rnd.nextInt(3) // 3..5
      val docs = (1L to 40L).map { id =>
        val n = 5 + rnd.nextInt(20)
        id -> (1 to n).map(_ => s"w${rnd.nextInt(8)}").mkString(" ")
      }
      val expected = naive(docs, k)
      val got = Dedup.spanProfile(docs.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      assert(got === expected, s"trial=$trial k=$k")
    }
  }
}
