package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** BPE induction kernels (operators.Bpe): greedy one-pass merge
  * semantics, weighted argmax with its pinned tiebreak, and the
  * char+marker segmentation — the invariants the unrolled DuckDB chain
  * re-derives positionally for the bpe_train/bpe_segment hash gates.
  */
class BpeSpec extends SparkTestBase {

  private def segFrame(rows: Seq[(String, Long, Seq[String])]): DataFrame = {
    val session = spark
    import session.implicits._
    rows.toDF("word", "freq", "toks")
  }

  private def merged(seg: DataFrame, l: String, r: String): Map[String, Seq[String]] =
    Bpe.applyMerge(seg, l, r).collect()
      .map(row => row.getString(0) -> row.getSeq[String](2)).toMap

  test("greedy pass: overlapping occurrences merge left-to-right, never twice") {
    val seg = segFrame(Seq(
      ("aaa", 1L, Seq("a", "a", "a")),
      ("aaaa", 1L, Seq("a", "a", "a", "a")),
      ("baa", 1L, Seq("b", "a", "a")),
      ("abab", 1L, Seq("a", "b", "a", "b")),
      ("none", 1L, Seq("n", "o"))))
    val got = merged(seg, "a", "a")
    assert(got("aaa") == Seq("aa", "a"), "leftmost wins: [aa, a], not [a, aa]")
    assert(got("aaaa") == Seq("aa", "aa"))
    assert(got("baa") == Seq("b", "aa"))
    assert(got("abab") == Seq("a", "b", "a", "b"), "no (a,a) pair present")
    assert(got("none") == Seq("n", "o"))
  }

  test("a merged token does not re-match as the pair's left side in the same pass") {
    // merge (a,b) over [a,b,b]: first pair merges to ab; the new last
    // token "ab" must not then consume the trailing b
    val got = merged(segFrame(Seq(("abb", 1L, Seq("a", "b", "b")))), "a", "b")
    assert(got("abb") == Seq("ab", "b"))
  }

  test("argmax weights pairs by type frequency with (count, l, r) tiebreak") {
    // (l,o) appears in both types: 5+2 = 7; (o,w) only in "low": 5;
    // (w,</w>) 5; (o,</w>) 2 — winner (l,o)
    val seg = segFrame(Seq(
      ("low", 5L, Seq("l", "o", "w", "</w>")),
      ("lo", 2L, Seq("l", "o", "</w>"))))
    val best = Bpe.bestOf(seg).collect().head
    assert((best.getString(0), best.getString(1), best.getLong(2)) == ("l", "o", 7L))
    // exact tie on count → lexicographic (l, r): (a,b) beats (a,c) and (b,a)
    val tie = segFrame(Seq(
      ("x1", 3L, Seq("a", "c")), ("x2", 3L, Seq("b", "a")), ("x3", 3L, Seq("a", "b"))))
    val t = Bpe.bestOf(tie).collect().head
    assert((t.getString(0), t.getString(1)) == ("a", "b"))
  }

  test("segmentation is chars plus the end-of-word marker") {
    val session = spark
    import session.implicits._
    val seg = Bpe.seg0(Seq(("low", 5L)).toDF("word", "freq")).collect().head
    assert(seg.getSeq[String](2) == Seq("l", "o", "w", "</w>"))
  }

  test("graded chain on real testdata: K ranked merges, segments use the learned vocab") {
    val merges = graft.SparkEntry.queries("bpe_train")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(merges.length == 8)
    assert(merges.map(_.getInt(0)).toSeq == (1 to 8), "one merge per rank, ordered")
    merges.foreach { m =>
      assert(m.getString(3) == m.getString(1) + m.getString(2), "merged = l || r")
      assert(m.getLong(4) > 0)
    }
    val segs = graft.SparkEntry.queries("bpe_segment")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(segs.length == 30)
    val vocabGrowth = merges.map(_.getString(3)).toSet
    // every multi-char piece (beyond the marker) must be a learned merge
    val pieces = segs.flatMap(_.getString(3).split(" ")).toSet
    pieces.filter(p => p.length > 1 && p != "</w>").foreach(p =>
      assert(vocabGrowth.contains(p) || p.endsWith("</w>"),
        s"piece $p must come from the learned merge table"))
  }

  test("property: the fold pass equals an imperative greedy reference on random inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the semantics both the Spark fold and the oracle's run-parity
    // windows must implement: scan left to right, merge non-overlapping
    def reference(toks: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toList
    }
    val tok = Gen.oneOf("a", "b", "c", "ab", "ba")
    val gen: Gen[(List[String], String, String)] = for {
      n <- Gen.choose(1, 12)
      toks <- Gen.listOfN(n, tok)
      l <- tok; r <- tok
    } yield (toks, l, r)
    // raw generators + fixed seeds (the FreqSketchSpec convention); all
    // cases of one (l, r) batch ride a single applyMerge call
    val cases = (0 until 60).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i * 13L + 5)).map(c => (i, c)))
    cases.groupBy { case (_, (_, l, r)) => (l, r) }.foreach { case ((l, r), grp) =>
      val session = spark
      import session.implicits._
      val seg = grp.map { case (id, (toks, _, _)) => (id.toString, 1L, toks) }
        .toDF("word", "freq", "toks")
      val got = Bpe.applyMerge(seg, l, r).collect()
        .map(row => row.getString(0) -> row.getSeq[String](2).toList).toMap
      grp.foreach { case (id, (toks, _, _)) =>
        assert(got(id.toString) == reference(toks, l, r),
          s"case $id: toks=$toks pair=($l,$r)")
      }
    }
  }

  test("local trainer equals the Catalyst chain merge-for-merge on the graded shape") {
    // a corpus-ish type table with ties, repeats, and shared suffixes —
    // the two lanes must pick identical (l, r, count) at every round
    val types = Seq(
      ("table", 40L), ("tables", 25L), ("stable", 10L), ("tab", 9L),
      ("merge", 30L), ("merges", 12L), ("merged", 8L),
      ("scan", 22L), ("scans", 7L), ("span", 7L), ("spans", 5L),
      ("a", 50L), ("ab", 3L))
    val session = spark
    import session.implicits._
    val df = types.toDF("word", "freq")
    val (sparkMerges, sparkSeg) = Bpe.chainOf(df, 8)
    val (localMerges, localSeg) = Bpe.localChain(types, 8)
    assert(localMerges == sparkMerges,
      "the local loop and the Catalyst chain must learn identical merges")
    val sparkFinal = sparkSeg.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    sparkSeg.unpersist(false)
    val localFinal = localSeg.map { case (w, _, t) => w -> t.toList }.toMap
    assert(localFinal == sparkFinal,
      "final segmentations must agree token-for-token")
  }

  test("realistic parameters: 1024 rounds over a large vocabulary — round-trip + closure") {
    // a synthetic vocabulary big enough that 1024 merges do not exhaust it:
    // 3000 types of 6-10 lowercase chars, Zipf-ish frequencies
    val rnd = new scala.util.Random(17)
    val types = (0 until 3000).map { i =>
      val w = (0 until (6 + rnd.nextInt(5)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w + i.toString.map(c => ('a' + (c - '0')).toChar), 1L + 5000L / (i + 1))
    }.distinct
    val (merges, seg) = Bpe.localChain(types, Bpe.BIG_K)
    assert(merges.size == Bpe.BIG_K,
      s"the vocabulary must sustain all ${Bpe.BIG_K} rounds, got ${merges.size}")
    assert(merges.map(_._1) == (1 to Bpe.BIG_K), "ranks are dense and ordered")
    // round-trip: pieces always reassemble the word + marker exactly
    seg.foreach { case (w, _, toks) =>
      assert(toks.mkString("") == w + "</w>", s"round-trip broke for $w")
    }
    // closure: every non-atomic piece is the concatenation of some learned
    // merge — the vocabulary is exactly {chars} ∪ {marker} ∪ {merges}
    val learned = merges.map { case (_, l, r, _) => l + r }.toSet
    seg.flatMap(_._3).distinct.foreach { t =>
      assert(t.length == 1 || t == "</w>" || learned.contains(t),
        s"piece $t is neither atomic nor a learned merge")
    }
    // determinism: a rerun learns the identical table
    assert(Bpe.localChain(types, Bpe.BIG_K)._1 == merges)
  }

  test("graded encode: per-document piece counts are bounded below by token counts") {
    val enc = graft.SparkEntry.queries("bpe_encode")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: every token is at least one piece")
    }
  }
}
