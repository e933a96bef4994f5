package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The writer lock driven by TWO REAL PROCESSES — the in-process
  * PersistentSinkSpec forges lock files; this spec forks an actual second
  * JVM (LockDriveMain) against the same table dir, so what is exercised
  * is the production shape: live foreign pids, hard-killed holders, and
  * filesystem-only coordination.
  *
  *   - a foreign writer parked MID-MERGE (lock held) blocks both this
  *     process's merge and its vacuum, loudly, touching nothing;
  *   - once the foreign merge completes, the local writer proceeds and
  *     both commits are visible (serialization, no lost update);
  *   - a foreign writer hard-killed while holding the lock (pid really
  *     dead, same host) is swept automatically — hands-off restart;
  *   - vacuum blocked by the in-flight foreign merge deletes nothing.
  */
class LockContentionSpec extends SparkTestBase {

  private def childClasspath: String = System.getProperty("java.class.path")

  private def jvmFlags: Seq[String] = {
    import java.lang.management.ManagementFactory
    ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.toSeq
      .filter(_.startsWith("--add-opens"))
  }

  /** Spawn LockDriveMain in a fresh JVM; returns the Process and its
    * combined stdout/stderr log (the race test reads MERGED/LOST from
    * it). */
  private def spawnLogged(mode: String, dir: String, beacon: String,
                          batchId: Long, lo: Long, hi: Long): (Process, Path) = {
    val log = Files.createTempFile("graft-lockdrive", ".log")
    val cmd = Seq("java") ++ jvmFlags ++ Seq(
      "-Xmx1g", "-cp", childClasspath,
      "-Dspark.ui.enabled=false",
      "graft.streaming.LockDriveMain",
      mode, dir, beacon, batchId.toString, s"$lo:$hi")
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(log.toFile)
      .start()
    (p, log)
  }

  private def spawn(mode: String, dir: String, beacon: String,
                    batchId: Long, lo: Long, hi: Long): Process =
    spawnLogged(mode, dir, beacon, batchId, lo, hi)._1

  private def awaitFile(p: Path, timeoutMs: Long = 120000): Unit = {
    val t0 = System.currentTimeMillis()
    while (!Files.exists(p)) {
      assert(System.currentTimeMillis() - t0 < timeoutMs, s"timed out waiting for $p")
      Thread.sleep(100)
    }
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("a live foreign writer (real second JVM) blocks merge and vacuum loudly; " +
      "completion serializes; a hard-killed holder sweeps") {
    val table = Files.createTempDirectory("graft-2proc").resolve("t").toString
    val beacon = Files.createTempDirectory("graft-2proc-b").resolve("b").toString
    val session = spark
    val local = session.range(0, 0).select(col("id"), (col("id") * 10).as("v"))
    val sink = new ParquetTableSink(spark, table, local, Seq("id"))

    // establish v0 from THIS process so both sides share committed state
    sink.merge(session.range(0, 100).select(col("id"), (col("id") * 10).as("v")), 0L)

    // 1) foreign writer parks mid-merge holding the lock
    val holder = spawn("hold", table, beacon, 1L, 100L, 200L)
    awaitFile(Paths.get(s"$beacon.held"))
    val e1 = intercept[RuntimeException](sink.merge(
      session.range(200, 300).select(col("id"), (col("id") * 10).as("v")), 2L))
    assert(e1.getMessage.contains("locked by a live writer"),
      s"local merge must stop loudly against the live foreign lock: ${e1.getMessage}")
    val e2 = intercept[RuntimeException](sink.vacuum(keep = 1))
    assert(e2.getMessage.contains("locked by a live writer"),
      "vacuum must stop loudly against the live foreign lock")
    assert(ids(sink.current) == (0L until 100L),
      "the blocked writers must leave committed state untouched")

    // 2) release the foreign writer; its commit lands; a SECOND foreign
    // process then merges the next batch, and the local retry serializes
    // after both — three writers' commits all visible, no lost update
    Files.writeString(Paths.get(s"$beacon.go"), "go")
    assert(holder.waitFor(120, TimeUnit.SECONDS) && holder.exitValue() == 0,
      "the foreign merge must complete cleanly once released")
    val plain = spawn("merge", table, s"$beacon-m", 2L, 200L, 250L)
    assert(plain.waitFor(120, TimeUnit.SECONDS) && plain.exitValue() == 0,
      "an uncontended foreign merge must land cleanly")
    sink.merge(session.range(250, 300).select(col("id"), (col("id") * 10).as("v")), 3L)
    assert(ids(sink.current) == (0L until 300L),
      "all three processes' commits must be visible — serialized, no lost update")

    // 3) a foreign writer hard-killed while HOLDING the lock: pid is
    // really dead on this host, so the next local merge sweeps hands-off
    val victim = spawn("die", table, s"$beacon-die", 4L, 300L, 400L)
    awaitFile(Paths.get(s"$beacon-die.held"))
    assert(victim.waitFor(120, TimeUnit.SECONDS) && victim.exitValue() == 7,
      "the victim must have halted at the lock-held point")
    assert(Files.exists(Paths.get(table, "manifest", ".writer-lock")),
      "the hard kill must leave the lock behind (no finally ran)")
    sink.merge(session.range(300, 400).select(col("id"), (col("id") * 10).as("v")), 4L)
    assert(ids(sink.current) == (0L until 400L))
    assert(!Files.exists(Paths.get(table, "manifest", ".writer-lock")))

    // 4) vacuum blocked by an in-flight foreign merge deletes NOTHING,
    // then proceeds once the merge lands
    val dataDirs = () => {
      val s = Files.list(Paths.get(table, "data"))
      try s.iterator().asScala.size finally s.close()
    }
    val before = dataDirs()
    val holder2 = spawn("hold", table, s"$beacon-v", 5L, 400L, 500L)
    awaitFile(Paths.get(s"$beacon-v.held"))
    intercept[RuntimeException](sink.vacuum(keep = 1))
    assert(dataDirs() == before,
      "a vacuum blocked by a foreign in-flight merge must not delete any dir")
    Files.writeString(Paths.get(s"$beacon-v.go"), "go")
    assert(holder2.waitFor(120, TimeUnit.SECONDS) && holder2.exitValue() == 0)
    sink.vacuum(keep = 1)
    assert(ids(sink.current) == (0L until 500L),
      "vacuum after the foreign merge keeps the merged current version intact")
  }

  test("two real processes racing the sweep-restore of a dead lock: single holder, loud loser") {
    val table = Files.createTempDirectory("graft-race").resolve("t").toString
    val beacon = Files.createTempDirectory("graft-race-b").resolve("b").toString
    val session = spark
    val local = session.range(0, 0).select(col("id"), (col("id") * 10).as("v"))
    val sink = new ParquetTableSink(spark, table, local, Seq("id"))
    sink.merge(session.range(0, 100).select(col("id"), (col("id") * 10).as("v")), 0L)

    // leave a genuinely dead holder's lock behind (hard-killed real pid)
    val victim = spawn("die", table, s"$beacon-die", 1L, 100L, 200L)
    awaitFile(Paths.get(s"$beacon-die.held"))
    assert(victim.waitFor(120, TimeUnit.SECONDS) && victim.exitValue() == 7)
    assert(Files.exists(Paths.get(table, "manifest", ".writer-lock")),
      "the dead holder's lock must be on disk before the race")

    // two contenders park on the same start gun, then race verify-dead →
    // flock'd sweep → createLink. The winner parks 5 s inside its critical
    // section, so the loser's whole attempt provably lands inside it.
    val (a, aLog) = spawnLogged("race", table, beacon, 2L, 200L, 250L)
    val (b, bLog) = spawnLogged("race", table, beacon, 3L, 250L, 300L)
    // fire the gun only once BOTH are past startup and parked on it —
    // boot skew must not exceed the winner's hold window
    awaitFile(Paths.get(s"$beacon.${a.pid()}.ready"))
    awaitFile(Paths.get(s"$beacon.${b.pid()}.ready"))
    Files.writeString(Paths.get(s"$beacon.go"), "go")
    assert(a.waitFor(180, TimeUnit.SECONDS) && b.waitFor(180, TimeUnit.SECONDS),
      "both contenders must terminate")
    val outs = Seq(aLog, bLog).map(p => Files.readString(p))
    val merged = outs.count(_.contains("MERGED"))
    val lost = outs.filter(_.contains("LOST"))
    assert(merged == 1, s"exactly one contender may win the swept lock; logs:\n${outs.mkString("\n---\n")}")
    assert(lost.size == 1 && lost.head.toLowerCase.contains("lock"),
      s"the loser must fail loudly on the lock, not silently or obscurely: $lost")

    // the winner's batch landed exactly once; the loser touched nothing;
    // no lock or sweep debris survives the winner's release
    val cur = ids(sink.current)
    val winnerRows = if (outs.head.contains("MERGED")) (200L until 250L) else (250L until 300L)
    assert(cur == (0L until 100L) ++ winnerRows,
      s"committed state must be v0 + exactly the winner's batch, got ${cur.size} rows")
    assert(!Files.exists(Paths.get(table, "manifest", ".writer-lock")),
      "the winner's release must leave no lock behind")
  }
}
