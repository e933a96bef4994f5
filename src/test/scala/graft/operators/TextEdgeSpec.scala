package graft.operators

import java.nio.file.Files

import graft.SparkTestBase

/** Degenerate-document edges for the text/dedup family: empty text and
  * single-token docs must produce NULL ratios (not NaN/Inf) and empty
  * shingle sets (not crashes) — the engine-agnostic guard ADVICE r1 asked
  * for, pinned here because the driver corpus happens to contain neither.
  */
class TextEdgeSpec extends SparkTestBase {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val session = spark
    import session.implicits._
    val dir = Files.createTempDirectory("graft-edge").toString
    rows.map { case (id, text) => (id, text, "en", "test", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("empty and single-token docs: NULL ratios, no NaN/Infinity") {
    val session = spark
    import session.implicits._
    val dir = writeDocs(Seq(1L -> "", 2L -> "word", 3L -> "two words"))
    val q = TextAnalysis.queries("text_quality")(spark, dir)
    val rows = q.collect()
    val empty = rows.find(_.getLong(0) == 1L).get
    assert(empty.isNullAt(2) && empty.isNullAt(3), "empty doc must yield NULL ratios")
    rows.foreach { r =>
      (2 until r.length).foreach { i =>
        if (!r.isNullAt(i)) {
          val v = r.getDouble(i)
          assert(!v.isNaN && !v.isInfinite, s"doc ${r.getLong(0)} col $i is $v")
        }
      }
    }
  }

  test("docs below shingle width produce empty sets and no LSH pairs") {
    val session = spark
    import session.implicits._
    val dir = writeDocs(Seq(1L -> "", 2L -> "a b", 3L -> "ab"))
    val sig = DedupText.queries("dedup_minhash_sig")(spark, dir)
      .select("doc_id", "n_shingles").as[(Long, Int)].collect().toMap
    assert(sig == Map(1L -> 0, 2L -> 0, 3L -> 0))
    assert(DedupText.queries("dedup_lsh_pairs")(spark, dir).count() == 0)
    assert(DedupText.queries("dedup_ngram")(spark, dir).count() == 0)
  }

  test("token counts on the degenerate docs stay well-defined") {
    val session = spark
    import session.implicits._
    val dir = writeDocs(Seq(1L -> "", 2L -> "one two three"))
    val toks = TextAnalysis.queries("text_tokens")(spark, dir)
      .select("doc_id", "n_ws_tokens").as[(Long, Long)].collect().toMap
    // split("", " ") yields [""] on both engines: 1 token for the empty doc
    assert(toks == Map(1L -> 1L, 2L -> 3L))
  }

  test("bm25: rarity raises idf, tf saturates, termless docs drop out") {
    val session = spark
    import session.implicits._
    // "vector" appears in 1 doc, "hash" in 3 → equal-tf docs must rank the
    // rare term higher; doc 4 repeats "hash" 4× — saturation keeps its
    // score under 4× doc 2's single-occurrence score; doc 5 has no query
    // term at all and must not appear.
    val dir = writeDocs(Seq(
      1L -> "vector pad pad pad",
      2L -> "hash pad pad pad",
      3L -> "hash pad pad pad",
      4L -> "hash hash hash hash",
      5L -> "pad pad pad pad"))
    val rows = TextAnalysis.queries("text_bm25")(spark, dir)
      .select("doc_id", "s_vector", "s_hash", "bm25")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(!rows.contains(5L), "doc without query terms must be excluded")
    assert(rows(1L)._2 > rows(2L)._3,
      "rare term (df=1) must outscore common term (df=3) at equal tf/dl")
    assert(rows(4L)._3 < 4 * rows(2L)._3,
      "tf=4 must score sublinearly vs tf=1 (BM25 saturation)")
    assert(rows(4L)._3 > rows(3L)._3, "higher tf still scores higher")
  }

  test("dedup_prefix: identical leading span collapses, min doc_id survives") {
    val session = spark
    import session.implicits._
    val head = ("tok " * 20).trim // 79 chars > PREFIX_CHARS=64
    val dir = writeDocs(Seq(
      3L -> s"$head tail three entirely different words",
      1L -> s"$head other ending here",
      2L -> "a disjoint document that shares no prefix with anything"))
    val got = DedupText.queries("dedup_prefix")(spark, dir)
      .select("doc_id", "kept_doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq(3L -> 1L), "doc 3 drops in favor of min-id twin 1; doc 2 untouched")
    // normalization runs BEFORE the prefix cut: case and whitespace noise
    // inside the leading span must not defeat the match
    val dir2 = writeDocs(Seq(
      1L -> s"$head alpha",
      2L -> s"  ${head.toUpperCase.replace(" ", "   ")} beta"))
    val got2 = DedupText.queries("dedup_prefix")(spark, dir2)
      .select("doc_id", "kept_doc_id").as[(Long, Long)].collect().toSeq
    assert(got2 == Seq(2L -> 1L))
  }
}
