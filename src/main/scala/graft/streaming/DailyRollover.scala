package graft.streaming

import java.time.LocalDate
import scala.collection.mutable.ArrayBuffer

/** Daily-rollover orchestration — the reference's outer daily loop
  * (`run.py:98-113`): when the calendar date changes, re-run the dimension
  * refresh chain IN FOREIGN-KEY ORDER (agencies → routes → services → stops;
  * children resolve parent surrogate keys, so order is load-bearing —
  * `agency.py:80-85,117-123,199-213`), then keep polling the fact stream
  * until the next rollover.
  *
  * Spark-shaped: the poll body is typically a `Trigger.AvailableNow`
  * streaming drain or a `ProcessingTime` query left running; each refresh
  * step is a batch pipeline (e.g. `Pipeline.stopsRefresh` written through a
  * `ParquetTableSink`-style target). The stream-static `enrich` join then
  * picks the refreshed dims up automatically (ST6) — this class only owns
  * WHEN the chain runs and in WHAT order.
  *
  * The clock is injected so tests drive rollovers deterministically; the
  * loop never calls wall-clock APIs itself. Refresh steps run under the same
  * bounded-retry discipline as the reference's config-refresh loop
  * (`run.py:69-77`, ≤ N attempts — `StreamingOps.withRetries` is the
  * streaming-query sibling).
  */
final class DailyRollover(clock: () => LocalDate,
                          refreshChain: Seq[(String, () => Unit)],
                          poll: () => Unit,
                          maxAttemptsPerStep: Int = 10) {
  require(maxAttemptsPerStep >= 1)

  private var lastDate: Option[LocalDate] = None
  private val log = ArrayBuffer.empty[(LocalDate, String)]

  /** (date, stepName) history of completed refresh steps — for tests and
    * telemetry; never consulted by the loop itself. */
  def refreshLog: Seq[(LocalDate, String)] = log.toSeq

  /** One scheduler tick: on a date change run the whole FK chain in order
    * (first tick counts as a change — the reference refreshes on startup,
    * run.py:84-96), otherwise poll once. A step that exhausts its attempt
    * budget propagates — a half-refreshed day must be loud, not polled over.
    */
  def tick(): Unit = {
    val today = clock()
    if (!lastDate.contains(today)) {
      refreshChain.foreach { case (name, step) =>
        retrying(name, step)
        log += ((today, name))
      }
      lastDate = Some(today) // only after the full chain committed
    } else poll()
  }

  /** Drive ticks until `stop()` — the reference's `while True` with the
    * sleep owned by the caller/scheduler, so tests run it synchronously. */
  def runUntil(stop: () => Boolean): Unit =
    while (!stop()) tick()

  private def retrying(name: String, step: () => Unit): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      try { step(); done = true }
      catch {
        // NonFatal only — fatal errors (OOM, interrupts) propagate
        case scala.util.control.NonFatal(e) if attempt < maxAttemptsPerStep =>
          System.err.println(s"[graft.rollover] $name attempt $attempt/$maxAttemptsPerStep " +
            s"failed (${e.getClass.getSimpleName}); retrying")
      }
    }
  }
}
