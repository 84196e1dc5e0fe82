package graft.functions

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Hammers `Registry.ensure` from many threads (round-10 advice #7: the
  * registration lock landed in commit 7cbfbe1 without a spec). Two
  * properties: same-name storms register once and never deadlock;
  * different-name storms all land. The expressions go through real
  * registered-function calls afterwards, so a half-registered builder
  * would surface as an analysis error, not just a flaky count. */
class RegistryConcurrencySpec extends SparkSpec {

  private def hammer(names: Seq[String], threads: Int): Unit = {
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    try {
      val tasks = (0 until threads).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try {
              // every thread registers EVERY name → maximal same-name contention
              for (n <- names)
                graft.functions.KgramHashes.registered(spark, k = kOf(n))
            } catch { case t: Throwable => failures.add(t) }
          }
        })
      }
      start.countDown()
      tasks.foreach(_.get(60, TimeUnit.SECONDS)) // a deadlock fails loudly here
    } finally pool.shutdownNow()
    assert(failures.isEmpty, s"concurrent ensure threw: ${failures.peek()}")
  }

  // KgramHashes bakes k into the registered name — distinct k = distinct name
  private def kOf(name: String): Int = name.drop(1).toInt

  test("concurrent ensure of the SAME name registers once, no deadlock") {
    hammer(Seq("k21"), threads = 16)
    // the function is actually usable after the storm
    val out = spark.range(1)
      .selectExpr("cast('abcdefghijklmnopqrstuvwxyz' as string) as t")
      .select(org.apache.spark.sql.functions.call_function(
        graft.functions.KgramHashes.registered(spark, 21), col("t")).as("hs"))
      .selectExpr("size(hs) as n").collect()
    assert(out.head.getInt(0) === 26 - 21 + 1)
  }

  test("concurrent ensure of DIFFERENT names all land") {
    val names = (22 to 29).map(k => s"k$k")
    hammer(names, threads = 12)
    for (k <- 22 to 29) {
      val fn = graft.functions.KgramHashes.registered(spark, k)
      assert(spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fn)), s"missing $fn")
    }
  }
}
