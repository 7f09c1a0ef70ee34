package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[Repetition.statsOf]] against an independent naive reimplementation on
  * random boilerplate-shaped inputs. The oracle queries only see
  * corpus-shaped text (no line/paragraph dups at all in the synthetic
  * corpus); this covers the branches the corpus never exercises.
  */
class RepetitionPropertySpec extends AnyFunSuite {
  import Repetition._

  private val rnd = new scala.util.Random(11)

  /** Naive metrics: Scala collections, no shared code with the
    * implementation's one-pass HashMap fold.
    */
  private def naive(s: String): Array[Double] = {
    def split(sep: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var rest = s
      var idx = rest.indexOf(sep)
      while (idx >= 0) {
        out += rest.substring(0, idx)
        rest = rest.substring(idx + sep.length)
        idx = rest.indexOf(sep)
      }
      out += rest
      out.toSeq.filter(_.exists(_ != ' '))
    }
    def dup(segs: Seq[String]): (Double, Double) =
      if (segs.isEmpty) (0.0, 0.0)
      else {
        val groups = segs.groupBy(identity).values.toSeq
        val dups = groups.map(g => g.size - 1).sum
        val dupChars = groups.map(g =>
          (g.size - 1).toLong * g.head.codePointCount(0, g.head.length)).sum
        val totChars = segs.map(x => x.codePointCount(0, x.length).toLong).sum
        (dups.toDouble / segs.size,
          if (totChars == 0) 0.0 else dupChars.toDouble / totChars)
      }
    val ws = "[a-z]+".r.findAllIn(s.toLowerCase).toVector
    val bigrams = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toVector
    val top =
      if (bigrams.size < MinBigramEvidence) 0.0
      else bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size
    val g5 = ws.sliding(DupNgramN).filter(_.size == DupNgramN).map(_.mkString(" ")).toVector
    val d5 =
      if (g5.size < MinBigramEvidence) 0.0
      else g5.groupBy(identity).values.filter(_.size >= 2).map(_.size).sum.toDouble / g5.size
    val (dl, dlc) = dup(split("\n"))
    val (dp, dpc) = dup(split("\n\n"))
    Array(dl, dlc, dp, dpc, top, d5)
  }

  test("statsOf agrees with the naive reimplementation on random boilerplate") {
    val vocab = Seq("buy", "now", "click", "here", "spam", "the", "a", "offer")
    for (_ <- 1 to 300) {
      val lines = Seq.fill(rnd.nextInt(8)) {
        if (rnd.nextBoolean() && rnd.nextBoolean()) "" // blank lines
        else Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ") + (if (rnd.nextInt(4) == 0) "  " else "")
      }
      val sep = if (rnd.nextBoolean()) "\n" else "\n\n"
      val text = lines.mkString(sep)
      val got = statsOf(text)
      val want = naive(text)
      assert(got.toSeq == want.toSeq, s"text=${text.replace("\n", "\\n")}")
    }
  }
}
