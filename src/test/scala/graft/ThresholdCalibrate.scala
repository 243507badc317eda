package graft

/** One-shot calibration for NigNormalKLSpec's hardcoded thresholds
  * (reference protocol: tests/threshold.py is run offline via
  * compute_sufficiently_stringent_threshold and the resulting constants
  * are pasted into the unit tests — recalibrating inside the test would
  * absorb the very regressions the threshold is meant to catch).
  *
  *   sbt "Test/runMain graft.ThresholdCalibrate"
  *
  * Prints, per case: the exact mixture-vs-analytic KL (for the
  * ExactBound constants) and the calibrated statistic threshold at
  * ns = 5, maxprob = 1e-6 (for the Thresholds map). */
object ThresholdCalibrate {
  def main(args: Array[String]): Unit = {
    import NigNormalKL._
    import StatTestUtil._
    val cases = Seq(
      "prior" -> fixture._1, "posterior" -> fixture._2,
      "conditional" -> fixture._3, "joint" -> fixture._4)
    for ((name, c) <- cases) {
      val t0 = System.nanoTime()
      val exact = exactKl(c)
      var seed = 0x5eedL + name.hashCode
      val t = computeSufficientlyStringentThreshold(
        () => { seed += 1; statistic(c, exact, 400, seed) }, ns = 5, maxprob = 1e-6)
      println(f"[calibrate] $name%-12s exactKL=$exact%.6f threshold=${t.threshold}%.3e " +
        f"failprob=${t.failprob}%.2e samples=${t.sampleSize} " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    TestSpark.spark.stop()
  }
}
