package graft.streaming

import java.time.LocalDate

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** The rollover loop's contract (run.py:98-113): FK-ordered refresh on each
  * date change (including startup), polling in between, bounded retry per
  * step, idempotent re-run after a failed day. Pure JVM — no SparkSession
  * needed; the steps under orchestration are Spark pipelines in production.
  */
class DailyRolloverSpec extends AnyFunSuite {

  private val chainNames = Seq("agencies", "routes", "services", "stops")

  test("startup + each date change runs the full chain in FK order; polls in between") {
    var today = LocalDate.of(2026, 8, 12)
    val ran = ArrayBuffer.empty[String]
    var polls = 0
    // each child asserts its parent already ran TODAY — order is observable,
    // not just logged
    val chain = chainNames.zipWithIndex.map { case (name, i) =>
      name -> (() => {
        if (i > 0) assert(ran.takeRight(i) == chainNames.take(i).toBuffer,
          s"$name must run after ${chainNames(i - 1)}")
        ran += name
        ()
      })
    }
    val loop = new DailyRollover(() => today, chain, () => polls += 1)

    loop.tick() // startup: refresh, no poll
    assert(ran.toSeq == chainNames && polls == 0)

    loop.tick(); loop.tick(); loop.tick() // same day: poll only
    assert(ran.size == 4 && polls == 3)

    today = today.plusDays(1) // midnight rollover
    loop.tick()
    assert(ran.toSeq == chainNames ++ chainNames, "date change must re-run the full chain")
    assert(polls == 3, "the rollover tick refreshes instead of polling")
    assert(loop.refreshLog.map(_._1).distinct ==
      Seq(LocalDate.of(2026, 8, 12), LocalDate.of(2026, 8, 13)))

    loop.tick()
    assert(polls == 4, "poll loop continues after the rollover")
  }

  test("a flaky step is retried within its budget and the chain completes") {
    val today = LocalDate.of(2026, 8, 12)
    var attempts = 0
    var stopsRan = false
    val chain = Seq(
      "routes" -> (() => {
        attempts += 1
        if (attempts < 3) throw new RuntimeException("transient dim-fetch failure")
      }),
      "stops" -> (() => { stopsRan = true; () })
    )
    new DailyRollover(() => today, chain, () => (), maxAttemptsPerStep = 5).tick()
    assert(attempts == 3 && stopsRan)
  }

  test("a persistently failing step propagates after its budget; next tick re-runs the day") {
    val today = LocalDate.of(2026, 8, 12)
    var routesRuns = 0
    var servicesFailures = 0
    var servicesOk = false
    val chain = Seq(
      "routes" -> (() => { routesRuns += 1; () }),
      "services" -> (() => {
        if (servicesFailures < 4) { servicesFailures += 1; throw new RuntimeException("down") }
        servicesOk = true
      })
    )
    val loop = new DailyRollover(() => today, chain, () => (), maxAttemptsPerStep = 2)
    intercept[RuntimeException] { loop.tick() } // 2 attempts, still failing
    intercept[RuntimeException] { loop.tick() } // day not committed: chain re-runs
    loop.tick() // 5th services attempt succeeds
    assert(servicesOk && routesRuns == 3,
      "an uncommitted day must re-run the whole FK chain (idempotent refreshes)")
    assert(loop.refreshLog.map(_._2) == Seq("routes", "routes", "routes", "services"))
  }

  test("runUntil drives ticks to the stop condition") {
    var today = LocalDate.of(2026, 8, 12)
    var polls = 0
    val loop = new DailyRollover(() => today, Seq("dims" -> (() => ())), () => polls += 1)
    loop.runUntil(() => polls >= 5)
    assert(polls == 5)
    today = today.plusDays(1)
    loop.runUntil(() => loop.refreshLog.size >= 2)
    assert(loop.refreshLog.map(_._1) ==
      Seq(LocalDate.of(2026, 8, 12), LocalDate.of(2026, 8, 13)))
  }
}
