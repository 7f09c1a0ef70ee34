package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("finds exactly the brute-force pairs within the distance bound") {
    val base = "the quick brown fox jumps over it"
    val rows = Seq(
      1L -> base,
      2L -> base.replace("quick", "quack"),          // dist 1
      3L -> base.replace("brown fox", "brawn fix"),  // dist 2
      4L -> base.toUpperCase,                        // far
      5L -> "completely unrelated text here!!")      // far
      .toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(rows, "id", "s", minShared = 5)
      .as[(Long, Long, Int)].collect().toSet
    val strs = Map(1L -> base, 2L -> base.replace("quick", "quack"),
      3L -> base.replace("brown fox", "brawn fix"), 4L -> base.toUpperCase,
      5L -> "completely unrelated text here!!")
    val expected = (for {
      a <- strs.keys; b <- strs.keys if a < b
      d = lev(strs(a), strs(b)) if d <= 2
    } yield (a, b, d)).toSet
    assert(got === expected)
    // (2,3) carries BOTH edits — distance 3 — and must stay out
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 3L)))
  }

  test("df-cap suppresses boilerplate-only blocking") {
    // 60 records sharing ONLY a boilerplate prefix (df 60 > cap 20) with
    // unique 2-char tails (too short to form their own grams): with the
    // cap, no pair reaches minShared uncapped grams → zero candidates;
    // without the cap, every pair blocks on the header and verifies at
    // distance ≤ 2 — the quadratic blowup the cap exists to kill
    val rows = (0 until 60).map { i =>
      (i.toLong, s"SHARED-HEADER-${('a' + i % 26).toChar}${('A' + i / 26).toChar}")
    }.toDF("id", "s")
    val capped = FuzzyJoin.editDistanceJoin(rows, "id", "s",
      minShared = 3, dfCap = 20, maxDist = 2)
    assert(capped.count() === 0L)
    val uncapped = FuzzyJoin.editDistanceJoin(rows, "id", "s",
      minShared = 3, dfCap = 1000, maxDist = 2)
    assert(uncapped.count() === 60L * 59 / 2)
  }

  test("matches the single-node reference pipeline on random mutated strings") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abcdefgh"
    def randStr(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    // 12 base strings, each with 0-2 mutated copies → known near-pairs
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    for (_ <- 0 until 12) {
      val base = randStr(16)
      rows += ((id, base)); id += 1
      for (_ <- 0 until rnd.nextInt(3)) {
        val pos = rnd.nextInt(base.length)
        val mut = base.updated(pos, alphabet(rnd.nextInt(alphabet.length)))
        rows += ((id, mut)); id += 1
      }
    }
    val (n, maxDist, minShared, dfCap) = (3, 2, 4, 1000)
    val got = FuzzyJoin.editDistanceJoin(rows.toSeq.toDF("id", "s"), "id", "s",
        n, maxDist, minShared, dfCap)
      .as[(Long, Long, Int)].collect().toSet
    // reference: same gram/threshold blocking + DP verify, single node
    def grams(s: String) = (0 to s.length - n).map(i => s.substring(i, i + n)).toSet
    val df = rows.flatMap { case (_, s) => grams(s) }
      .groupBy(identity).map { case (g, o) => g -> o.size }
    val kept = rows.map { case (i, s) =>
      (i, s, grams(s).filter(g => df(g) <= dfCap)) }
    val expected = (for {
      (ia, sa, ga) <- kept; (ib, sb, gb) <- kept if ia < ib
      if ga.intersect(gb).size >= minShared
      d = lev(sa, sb) if d <= maxDist
    } yield (ia, ib, d)).toSet
    assert(got === expected)
    assert(got.nonEmpty) // the fixture must actually exercise matches
  }

  test("short strings never pair; identical strings pair at distance 0") {
    val rows = Seq((1L, "ab"), (2L, "ab"), (3L, "same same same"),
      (4L, "same same same")).toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(rows, "id", "s", minShared = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((3L, 4L, 0)))
  }
}
