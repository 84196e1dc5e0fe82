package graft.sources

import org.scalatest.Args

/** Soak runner for the lock suites (r16 verdict directive 2): the
  * takeover/heartbeat specs are timing-sensitive concurrency tests
  * guarding the engine's only mutual-exclusion primitive, so one green
  * run is weak evidence. This executes WriterLockSpec +
  * LockFaultInjectionSpec + LockJanitorSpec N times in ONE JVM (a forked
  * `testOnly` loop would spend ~25 s per iteration on JVM+session start)
  * and fails loudly on the first red test, printing per-iteration
  * timing so a creeping slowdown is visible too.
  *
  *   Test/runMain graft.sources.LockSoak [iterations=50]
  */
object LockSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(50)
    var failures = 0
    val t0 = System.nanoTime()
    for (i <- 1 to n) {
      val it0 = System.nanoTime()
      for (suite <- Seq(new WriterLockSpec, new LockFaultInjectionSpec, new LockJanitorSpec)) {
        val rep = new org.scalatest.Reporter {
          def apply(event: org.scalatest.events.Event): Unit = event match {
            case f: org.scalatest.events.TestFailed =>
              failures += 1
              println(s"[soak] iter $i FAILED: ${suite.getClass.getSimpleName} - ${f.testName}")
              f.throwable.foreach(_.printStackTrace())
            case _ => ()
          }
        }
        suite.run(None, Args(rep)).succeeds()
      }
      println(f"[soak] iter $i%3d/$n ok  (${(System.nanoTime() - it0) / 1e9}%5.1f s)")
      require(failures == 0, s"soak failed at iteration $i — see above")
    }
    println(f"[soak] $n iterations × 3 suites green in ${(System.nanoTime() - t0) / 1e9}%.0f s, 0 flakes")
  }
}
