package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp dirs for graded queries' self-contained fixtures (stream drops,
  * Derby databases, ORC copies). Registered for recursive deletion at JVM
  * exit so repeated invocations (bench sweeps, profiler reps) don't
  * accumulate on-disk garbage past the process. Laziness is why cleanup
  * can't happen inside the query: the returned DataFrame still reads from
  * the fixture when the caller acts on it.
  */
object Scratch {
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        if (Files.exists(p))
          Files.walk(p).sorted(Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
      } catch { case _: Throwable => () } // exit-path cleanup is best-effort
    ))
    p
  }
}
