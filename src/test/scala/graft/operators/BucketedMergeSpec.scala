package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The 100 TB merge contract (SURVEY §2.1 S7 scale note): with the target
  * bucketed on the merge key, the per-batch upsert join must reuse the
  * target's bucketing — i.e. the physical plan has NO Exchange above the
  * target scan; only the (small) source side shuffles.
  */
class BucketedMergeSpec extends SparkTestBase {

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: p.children.flatMap(collectNodes)

  test("upsert against a bucketed target shuffles only the source side") {
    val session = spark
    import session.implicits._
    val wh = Files.createTempDirectory("graft-wh").toString

    val target = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    target.write
      .bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/tgt")
      .mode("overwrite")
      .saveAsTable("tgt_bucketed")
    try {
      val tgt = session.table("tgt_bucketed")
      val src = Seq((1L, "new"), (2000L, "ins")).toDF("k", "v")
      // AQE re-plans around small exchanges; turn it off so the static plan
      // shows exactly the distribution Catalyst required.
      session.conf.set("spark.sql.adaptive.enabled", "false")
      val merged = MergeOps.upsert(tgt, src, Seq("k"), nullSafeKeys = false)
      val plan = merged.queryExecution.executedPlan
      val nodes = collectNodes(plan)

      val exchanges = nodes.collect { case e: Exchange => e }
      assert(exchanges.size == 1,
        s"expected exactly one Exchange (source side), got ${exchanges.size}:\n$plan")
      // the target scan must sit below NO exchange: the bucketed layout is
      // the join distribution
      val targetScan = nodes.collectFirst {
        case f: FileSourceScanExec if f.relation.location.rootPaths.exists(_.toString.contains("tgt")) => f
      }
      assert(targetScan.isDefined, s"no file scan of the bucketed target in:\n$plan")
      assert(targetScan.get.bucketedScan, "target scan must use its buckets")
      def underExchange(p: SparkPlan, inEx: Boolean): Boolean = p match {
        case f: FileSourceScanExec if f eq targetScan.get => inEx
        case e: Exchange => e.children.exists(underExchange(_, inEx = true))
        case other => other.children.exists(underExchange(_, inEx))
      }
      assert(!underExchange(plan, inEx = false),
        s"bucketed target must not be re-shuffled:\n$plan")

      // and the merge itself is still correct
      val out = merged.orderBy("k").as[(Long, String)].collect()
      assert(out.length == 1001 && out(0) == ((1L, "new")) && out.last == ((2000L, "ins")))
    } finally {
      session.conf.set("spark.sql.adaptive.enabled", "true")
      session.sql("DROP TABLE IF EXISTS tgt_bucketed")
    }
  }
}
