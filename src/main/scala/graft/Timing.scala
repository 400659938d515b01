package graft

/** The ONE median-of-3 timing helper for every measurement main
  * (Bench has its own repeat loop keyed off SPARK_GRAFT_REPEATS; the
  * scale harnesses use this). Single-shot sub-10 s timings on this host
  * vary up to 1.5x run to run — only medians are comparable.
  */
object Timing {
  /** Runs `f` three times; returns (first result, median wall seconds). */
  def med3[T](f: => T): (T, Double) = {
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    (runs.head._1, runs.map(_._2).sorted.apply(1))
  }
}
