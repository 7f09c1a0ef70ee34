package graft

/** Fixed single-threaded CPU calibration kernel for the bench/probe records.
  *
  * Why: ambient host load moves query FAMILIES selectively — per-core
  * CPU-bound shapes (dedup shingle hashing, knn/hard-negative codegen
  * loops) have twice run 1.7–2.4× their envelopes in windows where the
  * suite median (the `load_ratio` normalizer, which is shuffle/launch
  * bound) moved <20%, costing a manual A/B against the previous round's
  * checked-out tree each time. A fixed in-JVM kernel timed at run start
  * and end gives the records a direct per-core-CPU measurement:
  * `cpu_ratio = kernel_now / kernel_of_the_baseline_run`, emitted next to
  * `load_ratio`, and the CPU-bound families' envelopes normalize by
  * whichever is larger ([[Bench.envelopeRatio]]).
  *
  * The kernel is the splitmix64 mixing stream over a fixed iteration
  * count: pure register ALU work (no allocation, no memory traffic), so it
  * measures exactly what the flagged families feel — per-core sustained
  * CPU speed — and is immune to block-manager/page-cache state. Median of
  * five ~0.1 s passes after a JIT warmup pass: the median is the
  * representative slowdown under sustained ambient load (a min would read
  * the one lucky scheduling window and under-report it).
  */
object Calibrate {

  /** DCE defeat: the kernel's fold lands somewhere the JIT must preserve. */
  @volatile private var sink: Long = 0L

  private def mix(iters: Int): Long = {
    var h = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0
    while (i < iters) {
      h += 0x9E3779B97F4A7C15L
      var z = h
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      acc ^= z ^ (z >>> 31)
      i += 1
    }
    acc
  }

  /** One calibration measurement in seconds: one untimed JIT-warmup pass,
    * then the median of `passes` timed passes of `iters` splitmix rounds.
    * ~1 s total at the defaults — negligible against a 100 s bench run,
    * and the same fixed work every call, on every host, forever (the
    * ratio of two measurements is meaningful only because the work is
    * pinned).
    */
  def kernelSec(iters: Int = 30_000_000, passes: Int = 5): Double = {
    require(iters > 0 && passes > 0, s"iters=$iters passes=$passes")
    sink ^= mix(iters) // JIT warmup (not timed)
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      sink ^= mix(iters)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    Bench.medianOfSorted(times)
  }
}
