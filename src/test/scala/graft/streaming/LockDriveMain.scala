package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Child-process driver for LockContentionSpec: a REAL second JVM writing
  * the same versioned table, so the cross-process writer-lock paths run
  * against live pids instead of forged lock files.
  *
  * args: mode dir beacon batchId loHi
  *   - merge: plain merge of [lo, hi) rows under batchId, print MERGED
  *   - hold:  merge that PARKS at the lock-held point until `beacon.go`
  *            appears (the in-flight foreign writer case)
  *   - die:   merge that hard-kills the JVM at the lock-held point
  *            (the crashed foreign writer case — lock left behind,
  *            pid genuinely dead)
  */
object LockDriveMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, dir, beacon, batchIdS, loHi) = args.take(5)
    val Array(lo, hi) = loHi.split(":").map(_.toLong)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.range(lo, hi).select(
      col("id"), (col("id") * 10).as("v"))
    val sink = new ParquetTableSink(spark, dir, rows.limit(0), Seq("id"))
    mode match {
      case "merge" =>
        sink.merge(rows, batchIdS.toLong)
        println("MERGED")
      case "hold" =>
        sink.onLockAcquired = () => {
          Files.writeString(Paths.get(s"$beacon.held"), "held")
          while (!Files.exists(Paths.get(s"$beacon.go"))) Thread.sleep(50)
        }
        sink.merge(rows, batchIdS.toLong)
        println("HELD_DONE")
      case "die" =>
        sink.onLockAcquired = () => {
          Files.writeString(Paths.get(s"$beacon.held"), "held")
          Runtime.getRuntime.halt(7) // no finally, no release: a hard crash
        }
        sink.merge(rows, batchIdS.toLong)
      case "race" =>
        // sweep-restore race: announce readiness (the spec fires the gun
        // only once BOTH contenders are past JVM/Spark startup — raw
        // sleeps would let boot skew exceed the hold window and serialize
        // the race), then park on the shared start gun so both hit the
        // DEAD lock in the same instant, then hold the won lock long
        // enough that the loser's attempt provably lands inside the
        // winner's critical section. Winner prints MERGED; the loser must
        // fail LOUDLY (createLink EEXIST or live-writer check) — printed
        // as LOST for the spec to assert on.
        Files.writeString(
          Paths.get(s"$beacon.${ProcessHandle.current().pid()}.ready"), "ready")
        while (!Files.exists(Paths.get(s"$beacon.go"))) Thread.sleep(10)
        sink.onLockAcquired = () => {
          Files.writeString(
            Paths.get(s"$beacon.${ProcessHandle.current().pid()}.held"), "held")
          Thread.sleep(5000)
        }
        try { sink.merge(rows, batchIdS.toLong); println("MERGED") }
        catch { case e: Throwable => println(s"LOST ${e.getMessage}") }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
