package graft

/** Shared measurement helpers for the benchmark mains (Bench,
  * ScalingBench) — one copy of the statistics both evidence artifacts use.
  */
object BenchUtil {
  /** True median: even-length inputs average the middle pair — `s(n/2)`
    * alone would systematically report the SLOWER of two runs (e.g. when
    * one of 3 reps fails and only 2 timings survive).
    */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }
}
