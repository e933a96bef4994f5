package graft

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

/** Temp dirs for graded queries' self-contained fixtures (stream drops,
  * Derby databases, ORC copies). Registered for recursive deletion at JVM
  * exit so repeated invocations (bench sweeps, profiler reps) don't
  * accumulate on-disk garbage past the process. Laziness is why cleanup
  * can't happen inside the query: the returned DataFrame still reads from
  * the fixture when the caller acts on it.
  *
  * ONE static shutdown hook drains a queue of registered dirs — per-dir
  * hooks would accumulate a thread per fixture invocation over a
  * long-lived session (bench sweeps call the fixture queries dozens of
  * times).
  */
object Scratch {
  private val registered = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    registered.iterator().asScala.foreach { p =>
      try {
        if (Files.exists(p))
          Files.walk(p).sorted(Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
      } catch { case _: Throwable => () } // exit-path cleanup is best-effort
    }
  ))

  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }
}
