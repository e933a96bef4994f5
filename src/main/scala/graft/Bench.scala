package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config(Tables.ntzConf._1, Tables.ntzConf._2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JIT/codegen/session init and parquet-reader paths,
    // so the first timed query measures itself rather than JVM start.
    // Best-effort: a warm-up failure (e.g. missing table) must not abort the
    // bench — the affected queries will report -1 below as before.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.names.foreach(n => Tables(spark, sfDir, n).limit(1).count())
    } catch { case e: Throwable => System.err.println(s"[bench] warm-up skipped: $e") }
    def jq(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def loadAvg: Double =
      try java.nio.file.Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadBefore = loadAvg
    // A failing query must be VISIBLE, not a normal-looking wall time: keep
    // the elapsed seconds but record the error per-query (stderr + "errors"
    // object in the JSON) so a broken plan can't hide in the perf artifact.
    //
    // Median-of-N sweeps (default 3): sub-second per-query regressions were
    // not attributable on a loaded machine (r3→r5 bench swings); the median
    // absorbs scheduling noise and one-off JIT/IO stalls. Each sweep runs
    // the whole suite in order with the cache cleared between sweeps, so
    // intra-sweep cache sharing (the dedup family) matches earlier rounds'
    // single-sweep semantics.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // optional comma-separated query filter: quiet-machine control re-runs
    // of flagged queries (tools/bench_delta.py) without paying a full sweep
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val sweeps: Seq[Map[String, (Double, Option[String])]] = (1 to runs).map { sweep =>
      val m = names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(300)}"
            System.err.println(s"[bench] $name FAILED (sweep $sweep): $msg")
            Some(msg)
        }
        name -> ((System.nanoTime() - t0) / 1e9, err)
      }.toMap
      // release the session-scoped cache entries dedup queries parked
      // (library hygiene: each sweep and the session end cache-empty)
      spark.sharedState.cacheManager.clearCache()
      // drop the ambient engine state the sink/stream queries accumulate —
      // embedded Derby keeps every database booted in-JVM and the streaming
      // state-store providers cache loaded stores past query termination;
      // across a 140-query sweep that pressure taxes every later query's
      // time. Both teardowns are no-ops for correctness: each query boots
      // its own scratch db / checkpoint.
      try java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true")
      catch { case _: java.sql.SQLException => () } // XJ015 = clean shutdown
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
      m
    }
    val results = names.map { case (name, _) =>
      val times = sweeps.map(_(name)._1).sorted
      (name, times(times.size / 2), sweeps.flatMap(_(name)._2).headOption)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"${jq(k)}:${jq(m)}" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // run-condition note: 1-min loadavg before/after — a contaminated run
    // (concurrent load, cf. the r3/r4 2x bench swing) is visible in the artifact
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,""" +
      s""""n_err":${results.count(_._3.isDefined)},"runs":$runs,"load_before":$loadBefore,"load_after":$loadAvg,""" +
      s""""cpus":"$cpus","sf":"$sfDir"}"""
    // Full-fidelity artifact first: every query, full precision.
    val out = args.headOption.orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .getOrElse("bench_out.json")
    try Files.writeString(Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    // The harness keeps only the LAST ~2000 chars of stdout, and every round
    // so far recorded "parsed": null because the full per-query map pushed
    // the line past that window (BENCH_r01..r08). So the stdout line must be
    // compact and bounded: 3-decimal seconds, numeric sf, and per-query
    // detail capped to the slowest entries that fit a 1500-char budget (the
    // complete map lives in the file named by "queries_file").
    def r3(d: Double): String = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val sfNum = "sf([0-9.]+)/*$".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse(jq(sfDir))
    val cpusNum = if (cpus.forall(_.isDigit) && cpus.nonEmpty) cpus else jq(cpus)
    // errors in the compact line are BOUNDED too (≤3 entries, ≤80-char
    // messages): the full object is in the file, and an unbounded errs here
    // would blow the same tail window this line exists to fit — exactly in
    // the many-failures case where the artifact matters most
    val errsCompact = results.collect { case (k, _, Some(m)) => (k, m) }.take(3)
      .map { case (k, m) => s"${jq(k)}:${jq(m.take(80))}" }
      .mkString("{", ",", "}")
    val head = s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},""" +
      s""""n_err":${results.count(_._3.isDefined)},"errors":$errsCompact,"runs":$runs,""" +
      s""""load_before":$loadBefore,"load_after":$loadAvg,"cpus":$cpusNum,"sf":$sfNum,""" +
      s""""queries_file":${jq(out)},"queries":{"""
    val budget = 1500 - head.length - 2
    val entries = results.sortBy(-_._2).map { case (k, v, _) => s"\"$k\":${r3(v)}" }
    val shown = entries.scanLeft(0)(_ + _.length + 1).tail.zip(entries)
      .takeWhile(_._1 <= budget).map(_._2)
    println(head + shown.mkString(",") + "}}")
    spark.stop()
  }
}
