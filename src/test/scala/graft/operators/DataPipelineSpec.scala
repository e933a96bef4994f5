package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import graft.SparkTestBase

/** Behavioral pins for the corpus-construction operators: planted
  * contamination is found (and only it), mixture weights honor their
  * whole+fractional split, packing bins respect the token budget within a
  * shard, and PII scrubbing counts/redacts every planted match. The DuckDB
  * oracle checks cross-engine equality; these tests check the SEMANTICS on
  * fixtures the synthetic corpus doesn't contain.
  */
class DataPipelineSpec extends SparkTestBase {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("graft-dp").toString
    rows.map { case (id, text, source) => (id, text, "en", source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("decontam_ngram flags exactly the train docs sharing an n-gram with the benchmark") {
    val session = spark
    import session.implicits._
    // 97 and 194 are benchmark (doc_id % 97 == 0); 0 is too — keep it clean.
    val dir = writeDocs(Seq(
      (97L, "alpha beta gamma delta", "src1"),     // benchmark
      (194L, "one two three four", "src1"),        // benchmark
      (1L, "x alpha beta gamma y", "src2"),        // shares "alpha beta gamma"
      (2L, "clean words only here now", "src2"),   // clean
      (3L, "two three four", "src2"),              // shares "two three four"
      (4L, "beta gamma", "src2")))                 // under n — can't contaminate
    val out = DataPipeline.queries("decontam_ngram")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 3L -> 1L),
      s"exactly the two planted overlaps must be flagged, got $out")
  }

  test("decontam_ngram: benchmark gram set broadcasts; no cartesian anywhere") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = DataPipeline.queries("decontam_ngram")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: p.children.flatMap(nodes)
      val ns = nodes(plan)
      assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "the corpus side must stream through a broadcast hash join on the gram")
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]) &&
        !ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "decontamination must never degrade to all-pairs")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("sample_mixture honors the whole+fractional weight split per source") {
    val session = spark
    import session.implicits._
    // src0: whole 0, frac 1/4  → every doc keeps 0 or 1 copies
    // src3: whole 3, frac 1/4  → every doc keeps 3 or 4 copies
    val dir = writeDocs(
      (1L to 40L).map(i => (i, s"doc $i body", if (i <= 20) "src0" else "src3")))
    val copies = DataPipeline.queries("sample_mixture")(spark, dir)
      .groupBy("doc_id", "source").count()
      .as[(Long, String, Long)].collect()
    val bySource = copies.groupBy(_._2)
    // src0 rows appear only for thinning survivors (1 copy each)
    assert(bySource.getOrElse("src0", Array.empty).forall(_._3 == 1L),
      "src0 docs must keep at most one copy")
    assert(bySource("src3").forall(c => c._3 == 3L || c._3 == 4L),
      "src3 docs must keep 3 whole copies plus at most one fractional")
    // thinning is a ~25% Bernoulli on a hash — with 20 docs per source both
    // outcomes must occur (probability of a degenerate draw < 1e-2)
    val src0Kept = bySource.getOrElse("src0", Array.empty).length
    assert(src0Kept > 0 && src0Kept < 20, s"src0 thinning looks degenerate: $src0Kept/20")
    // copy_idx is dense 0..n-1 per doc
    val idx = DataPipeline.queries("sample_mixture")(spark, dir)
      .filter($"doc_id" === 21L).select("copy_idx").as[Long].collect().sorted
    assert(idx.headOption.contains(0L) && idx.sameElements(idx.indices.map(_.toLong)),
      s"copy_idx must be dense from 0, got ${idx.mkString(",")}")
  }

  test("pack_sequences: running totals are exact and bins cut at the budget") {
    val session = spark
    import session.implicits._
    val dir = writeDocs((1L to 200L).map(i =>
      (i, Seq.fill((i % 97 + 20).toInt)("w").mkString(" "), "src1")))
    val rows = DataPipeline.queries("pack_sequences")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect() // shard, doc_id, n_tokens, cum_before, seq_id
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      val sorted = docs.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, docId, n, cumBefore, seqId) =>
        assert(cumBefore == cum, s"shard $shard doc $docId: cum_before $cumBefore != $cum")
        assert(seqId == cum / 512, s"shard $shard doc $docId: seq_id $seqId != ${cum / 512}")
        cum += n
      }
    }
    // packing must produce more than one sequence somewhere (fixture sanity)
    assert(rows.map(r => (r._1, r._5)).distinct.length > rows.map(_._1).distinct.length,
      "fixture must be large enough to overflow at least one budget")
  }

  test("text_pii_scrub counts and redacts natural + planted PII") {
    val session = spark
    import session.implicits._
    val dir = writeDocs(Seq(
      (1L, "mail bob@site.org or ping 192.168.0.1 now", "src1"),
      (2L, "no pii at all", "src1")))
    val out = DataPipeline.queries("text_pii_scrub")(spark, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // doc 1: natural email+ip plus the planted pair; doc 2: planted only
    assert(out(0)._2 == 2 && out(0)._3 == 2, s"doc 1 counts: ${out(0)}")
    assert(out(1)._2 == 1 && out(1)._3 == 1, s"doc 2 counts: ${out(1)}")
    // the scrub hash equals md5 of the fully-redacted expected text
    val expected = "mail <EMAIL> or ping <IP> now contact <EMAIL> from <IP>"
    val got = spark.sql(s"SELECT md5('$expected')").as[String].head()
    assert(out(0)._4 == got, "scrubbed text must redact every match")
  }

  test("corpus_shuffle: dense per-shard seqs, decorrelated from doc_id, replayable") {
    val session = spark
    import session.implicits._
    val dir = writeDocs((0L until 200L).map(i => (i, s"doc number $i", "src1")))
    def run() = DataPipeline.queries("corpus_shuffle")(spark, dir)
      .select("doc_id", "shard", "seq").as[(Long, Long, Long)].collect().toSeq
    val a = run()
    assert(a == run(), "the shuffle order must replay bit-equal")
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.length).toSeq,
        s"shard $shard seqs must be dense 1..n")
    }
    // a hash draw must not preserve insertion order: within some shard, the
    // seq-sorted doc_ids are not monotonically increasing
    val shuffled = a.groupBy(_._2).values.exists { rows =>
      val ids = rows.sortBy(_._3).map(_._1)
      ids != ids.sorted
    }
    assert(shuffled, "within-shard order must be the hash draw, not doc_id order")
  }

  test("sample_temperature: smallest lang kept whole, heads flattened toward sqrt(n_d), deterministic") {
    val session = spark
    import session.implicits._
    // skewed language mix: 256 en, 64 de, 16 fr → rates 1/4, 1/2, 1
    val rows = (0L until 256L).map(i => (i, s"text $i", "en", "src1", 10L)) ++
      (256L until 320L).map(i => (i, s"text $i", "de", "src1", 10L)) ++
      (320L until 336L).map(i => (i, s"text $i", "fr", "src1", 10L))
    val dir = Files.createTempDirectory("graft-temp").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = DataPipeline.queries("sample_temperature")(spark, dir)
      .select("doc_id", "lang", "rate_ppm").as[(Long, String, Long)].collect().toSeq
    val kept = run()
    assert(kept == run(), "the draw must replay bit-equal")
    val byLang = kept.groupBy(_._2)
    // exact rates: sqrt(16/256) = 1/4, sqrt(16/64) = 1/2, sqrt(16/16) = 1
    assert(byLang("en").head._3 == 250000L && byLang("de").head._3 == 500000L &&
      byLang("fr").head._3 == 1000000L, "rate_ppm must be floor(sqrt(n_min/n_d)*1e6)")
    assert(byLang("fr").size == 16, "the smallest domain is kept whole")
    // hash-thinning concentration: kept(en) ≈ 64, kept(de) ≈ 32 within ±40%
    assert(math.abs(byLang("en").size - 64) <= 26, s"en kept ${byLang("en").size}, want ~64")
    assert(math.abs(byLang("de").size - 32) <= 13, s"de kept ${byLang("de").size}, want ~32")
  }
}
