package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** BPE (byte-pair-encoding) vocabulary induction over the documents
  * corpus — the tokenizer-training step of an LLM data pipeline
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"; the algorithm SentencePiece/fastBPE implement).
  *
  * Scale shape: the ONLY corpus-proportional stage is the word-type
  * extraction — one tokenize + `groupBy(word)` count with map-side
  * combine, the same shuffle `text_tfidf` already pays. Everything after
  * runs on the frequency-capped TYPE table (≤ V rows: standard practice —
  * BPE trainers operate on word-type counts, not the raw corpus, because
  * the merge objective only depends on type frequencies). Each of the K
  * merge rounds is: adjacent-pair explode over ≤ V short arrays → a
  * weighted count → a 1-row argmax broadcast back for the greedy rewrite.
  * At 100 TB the type table is still vocabulary-sized, so the K rounds
  * cost the same as at 1 GB; nothing corpus-proportional is ever
  * broadcast or iterated.
  *
  * Greedy-apply semantics (pinned by the oracle's window formulation and
  * BpeSpec): one merge pass rewrites each word left-to-right — a pair
  * occurrence merges iff its left token was not itself consumed by the
  * previous merge ("aaa" + (a,a) → [aa, a], never [a, aa] or [aa, aa]).
  * The Spark side states this as an `aggregate` fold over the token
  * array; the DuckDB oracle states it positionally (runs of consecutive
  * match positions, even offsets taken) — two independent derivations of
  * the same pass, hash-matched.
  *
  * Determinism: pair counts are exact longs; argmax tiebreak is
  * (count DESC, left ASC, right ASC); the type cut is
  * (freq DESC, word ASC) LIMIT V. Words are lowercase-ASCII types
  * (`^[a-z]+$`) with a `</w>` end-of-word marker so merges can capture
  * suffixes — per-language training on a normalized alphabet, the
  * standard setup.
  */
object Bpe {

  private val K = 8   // merge rounds (graded unrolled in the oracle)
  private val V = 256 // word-type table cap
  private val MARK = "</w>"
  /** The realistic-parameter lane (`bpe_train_big`): vocabulary-building
    * scale — 1024 merge rounds over a 4096-type table. DuckDB-graded via
    * the BIG_P merge prefix plus whole-run invariant columns (see
    * `bpeTrainBig`); a FULL K=1024 CTE chain would be the oracle-side
    * cost trap the graded K=8 chain documents. */
  private[operators] val BIG_K = 1024
  private[operators] val BIG_V = 4096
  /** Oracle-graded merge PREFIX of the BIG_K run: BPE is greedy-sequential,
    * so the first P merges of a K=1024 run are identical to a P-round run —
    * prefix equality against a P-round MATERIALIZED-CTE chain pins the full
    * loop's argmax/tie-break/rewrite determinism at the BIG_V type-table
    * width without the K=1024 CTE chain the oracle can't afford. */
  private[operators] val BIG_P = 64

  /** Frequency-capped word-type table: the one corpus-proportional stage. */
  private def wordTypes(s: SparkSession, dir: String, cap: Int = V): DataFrame =
    Tables(s, dir, "documents")
      .select(explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
        .as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(cap)

  /** Character segmentation + end-of-word marker. */
  private[operators] def seg0(types: DataFrame): DataFrame =
    types.withColumn("toks",
      concat(regexp_extract_all(col("word"), lit("."), lit(0)), array(lit(MARK))))

  /** The round's winning pair: freq-weighted adjacent-pair argmax. */
  private[operators] def bestOf(seg: DataFrame): DataFrame =
    seg.select(col("freq"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
      .limit(1)

  /** One greedy left-to-right merge pass of the pair (l, r) over every
    * type. The pair rides in as LITERALS — see `chain` for why. */
  private[operators] def applyMerge(seg: DataFrame, l: String, r: String): DataFrame =
    seg.withColumn("toks", aggregate(col("toks"),
      array().cast("array<string>"),
      (acc: Column, x: Column) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x)))))

  /** The learned merges (rank, l, r, pair_count) and the final
    * segmentation of the type table.
    *
    * The K rounds are a DRIVER-SIDE loop by design: BPE is inherently
    * sequential in K, and each round's argmax is ONE bounded row — the
    * trainer reads that scalar (the manifest-relation exemption class,
    * not a data collect) and folds it back in as literals. Keeping the
    * argmax as a joined frame instead makes each round's LOGICAL tree
    * embed the previous round's twice — exponential plan growth that
    * measured 11-17 s/query at sf0.1 in pure Catalyst analysis time.
    * With literals the lineage is linear in K; each round's ≤ V-row
    * segmentation is cached because two consumers read it (the next
    * argmax and the rewrite). Corpus-proportional work stays distributed
    * (the one tokenize+count shuffle inside `wordTypes`). */
  private def chain(s: SparkSession, dir: String): (Seq[(Int, String, String, Long)], DataFrame) =
    chainOf(wordTypes(s, dir), K)

  /** The Catalyst K-round trainer over an arbitrary type table (the graded
    * K=8 lane). A sliding cache window keeps two live entries instead of K
    * (round i's argmax materializes seg i−1's cache, freeing seg i−2); it
    * changes no values (BpeSpec pins the chain). `checkpointEvery` can
    * truncate lineage with an eager localCheckpoint but DEFAULTS OFF: a
    * localCheckpoint's blocks are unrecoverable after executor loss
    * (unlike the cache chain, which recomputes from source), so it is a
    * fragility trade no K≤8 caller should pay. NOTE the measured limit:
    * the per-round plan nests one higher-order aggregate per round and
    * optimizer+codegen cost grows EXPONENTIALLY in that depth
    * (~1.6×/round past ~10 unbroken rounds) — which is why the
    * realistic-K lane (`bpe_train_big`) runs `localChain` over the
    * collected type table instead of stretching this chain.
    * Stops early when no adjacent pair remains (every type fully merged). */
  private[operators] def chainOf(types: DataFrame, k: Int,
                                 checkpointEvery: Int = Int.MaxValue)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var seg = seg0(types).cache()
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= k && !exhausted) {
      val rows = bestOf(seg).collect() // the round's scalar: ≤ 1 row
      if (rows.isEmpty) exhausted = true
      else {
        val row = rows(0)
        val (l, r) = (row.getString(0), row.getString(1))
        merges += ((i, l, r, row.getLong(2)))
        val next = applyMerge(seg, l, r)
        val mat =
          if (i % checkpointEvery == 0) next.localCheckpoint(true)
          else next.cache()
        prev.foreach(_.unpersist(false)) // seg i−2: both consumers are done
        prev = Some(seg)
        seg = mat
        i += 1
      }
    }
    // Keep seg k−1's cache ALIVE on return: when the loop exits on i > k
    // (rather than exhaustion) the last round's bestOf never scanned `seg`,
    // and unpersisting its parent here would make the caller's first action
    // on the returned frame replay the whole K-round lineage. Eagerly
    // materializing `seg` instead costs a full pass every caller pays even
    // when (like bpe_encode) the final segmentation is never read — the
    // retained entry is ≤ the capped type table, vocabulary-sized.
    (merges.result(), seg)
  }

  private val bpeTrain: Q = (s, dir) => {
    val session = s
    import session.implicits._
    chain(s, dir)._1.toDF("merge_rank", "l", "r", "pair_count")
      .select(col("merge_rank"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"), col("pair_count"))
      .orderBy("merge_rank")
  }

  /** Tie-breaks by UTF-8 byte order — Spark's binary string ordering — so
    * `localChain` picks the same argmin pair as the Catalyst lane's `bestOf`
    * for ANY input, not just the BMP/ASCII range where JVM UTF-16 code-unit
    * ordering happens to agree (the two diverge for supplementary-plane
    * characters, where UTF-16 surrogates sort below some BMP code points). */
  private val utf8Ordering: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var c = 0
    while (i < n && c == 0) { c = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
    if (c != 0) c else x.length - y.length
  }

  /** The greedy left-to-right merge pass of (l, r) over one token array —
    * the local twin of `applyMerge`'s aggregate fold (BpeSpec pins the two
    * lanes merge-for-merge equal on the graded parameters). */
  private def localPass(toks: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += l + r; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** The K-round trainer run LOCALLY over a collected type table. The type
    * table is capped at `V`/`BIG_V` rows by construction — vocabulary-sized
    * metadata, not corpus data — so collecting it is the same bounded-
    * driver-read class as the 1-row argmax the graded chain already does,
    * and is how production tokenizer trainers work (SentencePiece / HF:
    * distributed count, local merge loop). The Catalyst formulation of the
    * same loop (`chainOf`) is the graded K=8 lane; per-round plan nesting
    * makes it exponential in round depth past ~10 rounds (nested
    * higher-order aggregates defeat both the optimizer and codegen), while
    * this loop is O(types · len) per round — K=1024 runs in milliseconds.
    * Returns (merges, final segmentation). */
  private[operators] def localChain(types: Seq[(String, Long)], k: Int)
      : (Seq[(Int, String, String, Long)], Seq[(String, Long, Array[String])]) = {
    var seg = types.map { case (w, f) =>
      (w, f, w.map(_.toString).toArray :+ MARK)
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= k && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seg.foreach { case (_, f, toks) =>
        var j = 0
        while (j + 1 < toks.length) {
          val key = (toks(j), toks(j + 1))
          counts.update(key, counts.getOrElse(key, 0L) + f)
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy({ case ((l, r), c) => (-c, l, r) })(
          Ordering.Tuple3(Ordering.Long, utf8Ordering, utf8Ordering))
        merges += ((i, l, r, c))
        seg = seg.map { case (w, f, toks) => (w, f, localPass(toks, l, r)) }
        i += 1
      }
    }
    (merges.result(), seg)
  }

  /** Realistic-parameter training: BIG_K merge rounds over the BIG_V-type
    * table — the vocabulary-building workload (a real tokenizer is ~32k
    * merges; 1024 exercises the same shape at bench-able cost). The ONLY
    * corpus-proportional work is `wordTypes`' tokenize+count shuffle; the
    * merge rounds run on the collected ≤ BIG_V-row type table via
    * `localChain`, so round cost is exactly flat in corpus size.
    *
    * Oracle-graded via the BIG_P-merge prefix (see `BIG_P`): the output is
    * the first 64 merges of the FULL K=1024 run — byte-equal to a 64-round
    * chain by greedy-sequentiality — plus three invariant columns over the
    * whole run the oracle CAN state: `n_types` (the capped type-table
    * cardinality, exact SQL), `term_ok` (the loop stopped only for a
    * legitimate reason: all BIG_K rounds ran, or every type was fully
    * merged to one token — asserted true), and `closure_ok` (every merge side is a
    * base symbol or the product of an earlier rank, the structural
    * invariant of a valid BPE vocabulary — asserted true). The deep
    * cross-lane equality at arbitrary K stays pinned by BpeSpec. */
  private val bpeTrainBig: Q = (s, dir) => {
    val session = s
    import session.implicits._
    val types = wordTypes(s, dir, BIG_V).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val (merges, seg) = localChain(types, BIG_K)
    val nTypes = seg.size.toLong
    // the loop may stop before BIG_K on a small corpus — legitimate only
    // when it EXHAUSTED (every type merged to a single token, no adjacent
    // pair left); any other early stop is a trainer bug the gate must see
    val termOk = merges.size == BIG_K || seg.forall(_._3.length == 1)
    val closureOk = {
      val built = scala.collection.mutable.HashSet.empty[String]
      merges.forall { case (_, l, r, _) =>
        def known(t: String) =
          t == MARK || t.codePointCount(0, t.length) == 1 || built(t)
        val ok = known(l) && known(r)
        built += (l + r)
        ok
      }
    }
    merges.take(BIG_P).toDF("merge_rank", "l", "r", "pair_count")
      .select(col("merge_rank"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"), col("pair_count"),
        lit(nTypes).as("n_types"), lit(termOk).as("term_ok"),
        lit(closureOk).as("closure_ok"))
      .orderBy("merge_rank")
  }

  /** Encode a document sample with the learned merges: apply the K merge
    * passes to the sample's DISTINCT alpha word types (encoding is a pure
    * function of the word — per-type work, not per-occurrence), join the
    * piece counts back to token occurrences, and reduce per document.
    * Non-alpha tokens (numbers, punctuation, non-Latin scripts) count one
    * piece each — the single-token fallback lane. The corpus-proportional
    * work is the tokenize + the type join + one doc-keyed aggregate; the
    * merge applications run on the distinct-type table only. */
  private val bpeEncode: Q = (s, dir) => {
    val (merges, _) = chain(s, dir)
    val toks = Tables(s, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"),
        explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
          .as("word"))
      .filter(length(col("word")) > 0)
    // the merges are literals, so the K passes fold into ONE linear plan
    // over the sample's distinct types — no per-round materialization
    var seg = seg0(toks.filter(col("word").rlike("^[a-z]+$"))
      .select("word").distinct().withColumn("freq", lit(1L)))
    merges.foreach { case (_, l, r, _) => seg = applyMerge(seg, l, r) }
    val perType = seg.select(col("word"), size(col("toks")).cast("long").as("k"))
    toks.join(perType, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("k"), lit(1L))).as("n_pieces"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  private val bpeSegment: Q = (s, dir) =>
    chain(s, dir)._2
      .orderBy(col("freq").desc, col("word").asc).limit(30)
      .select(col("word"), col("freq"),
        size(col("toks")).cast("long").as("n_pieces"),
        concat_ws(" ", col("toks")).as("pieces"))
      .orderBy(col("freq").desc, col("word").asc)

  val queries: Map[String, Q] = Map(
    "bpe_train" -> bpeTrain,
    "bpe_train_big" -> bpeTrainBig,
    "bpe_segment" -> bpeSegment,
    "bpe_encode" -> bpeEncode)

  // ---- oracle: the same K rounds unrolled as a CTE chain (the Lloyd/PQ
  // precedent) — pairs positionally, greedy pass via run-parity windows.
  // Every CTE is MATERIALIZED: each round references its predecessor 2-4
  // times, and DuckDB's default CTE inlining would expand the chain (and
  // its documents scans) exponentially in K.

  private def baseCtes(cap: Int = V): String =
    s"""words AS MATERIALIZED (
       |  SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word
       |  FROM documents
       |),
       |types AS MATERIALIZED (
       |  SELECT word, count(*) AS freq FROM words
       |  WHERE regexp_matches(word, '^[a-z]+$$')
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $cap
       |),
       |seg0 AS MATERIALIZED (
       |  SELECT word, freq, list_append(regexp_extract_all(word, '.'), '$MARK') AS toks
       |  FROM types
       |)""".stripMargin

  /** CTEs of round `i`: winning pair + greedy rewrite of seg{i-1}. */
  private def roundCtes(i: Int): String = {
    val prev = s"seg${i - 1}"
    s"""pair$i AS MATERIALIZED (
       |  SELECT word, freq, i, toks[i] AS l, toks[i+1] AS r FROM (
       |    SELECT word, freq, unnest(generate_series(1, len(toks) - 1)) AS i, toks
       |    FROM $prev)
       |),
       |best$i AS MATERIALIZED (
       |  SELECT l, r, sum(freq) AS pair_count FROM pair$i
       |  GROUP BY l, r ORDER BY pair_count DESC, l, r LIMIT 1
       |),
       |tak$i AS MATERIALIZED (
       |  SELECT word, i FROM (
       |    SELECT word, i, (i - min(i) OVER (PARTITION BY word, grp)) % 2 AS off FROM (
       |      SELECT p.word, p.i, p.i - row_number() OVER (PARTITION BY p.word ORDER BY p.i) AS grp
       |      FROM pair$i p, best$i b WHERE p.l = b.l AND p.r = b.r))
       |  WHERE off = 0
       |),
       |seg$i AS MATERIALIZED (
       |  SELECT word, any_value(freq) AS freq,
       |    list(CASE WHEN taken THEN l || r ELSE tok END ORDER BY i)
       |      FILTER (WHERE NOT prev_taken) AS toks
       |  FROM (
       |    SELECT f.word, f.freq, f.i, f.toks[f.i] AS tok,
       |      t.i IS NOT NULL AS taken, tp.i IS NOT NULL AS prev_taken, b.l, b.r
       |    FROM (SELECT word, freq, unnest(generate_series(1, len(toks))) AS i, toks
       |          FROM $prev) f
       |    CROSS JOIN best$i b
       |    LEFT JOIN tak$i t ON t.word = f.word AND t.i = f.i
       |    LEFT JOIN tak$i tp ON tp.word = f.word AND tp.i = f.i - 1)
       |  GROUP BY word
       |)""".stripMargin
  }

  private def withChain(body: String, k: Int = K, cap: Int = V): String =
    s"WITH ${baseCtes(cap)},\n${(1 to k).map(roundCtes).mkString(",\n")}\n$body"

  /** Encode-side CTEs: the doc sample's distinct alpha types, then the K
    * apply rounds — same greedy pass, but the winning pair comes from the
    * TRAIN chain's best$i (no per-round counting here). */
  private def encodeCtes: String = {
    val base =
      s"""dtoks AS MATERIALIZED (
         |  SELECT doc_id, word FROM (
         |    SELECT doc_id,
         |      unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word
         |    FROM documents WHERE doc_id % 7 = 0)
         |  WHERE len(word) > 0
         |),
         |eseg0 AS MATERIALIZED (
         |  SELECT word, list_append(regexp_extract_all(word, '.'), '$MARK') AS toks
         |  FROM (SELECT DISTINCT word FROM dtoks WHERE regexp_matches(word, '^[a-z]+$$'))
         |)""".stripMargin
    val rounds = (1 to K).map { i =>
      val prev = s"eseg${i - 1}"
      s"""etak$i AS MATERIALIZED (
         |  SELECT word, i FROM (
         |    SELECT word, i, (i - min(i) OVER (PARTITION BY word, grp)) % 2 AS off FROM (
         |      SELECT c.word, c.i, c.i - row_number() OVER (PARTITION BY c.word ORDER BY c.i) AS grp
         |      FROM (SELECT word, unnest(generate_series(1, len(toks) - 1)) AS i, toks
         |            FROM $prev) c, best$i b
         |      WHERE c.toks[c.i] = b.l AND c.toks[c.i+1] = b.r))
         |  WHERE off = 0
         |),
         |eseg$i AS MATERIALIZED (
         |  SELECT word,
         |    list(CASE WHEN taken THEN l || r ELSE tok END ORDER BY i)
         |      FILTER (WHERE NOT prev_taken) AS toks
         |  FROM (
         |    SELECT f.word, f.i, f.toks[f.i] AS tok,
         |      t.i IS NOT NULL AS taken, tp.i IS NOT NULL AS prev_taken, b.l, b.r
         |    FROM (SELECT word, unnest(generate_series(1, len(toks))) AS i, toks
         |          FROM $prev) f
         |    CROSS JOIN best$i b
         |    LEFT JOIN etak$i t ON t.word = f.word AND t.i = f.i
         |    LEFT JOIN etak$i tp ON tp.word = f.word AND tp.i = f.i - 1)
         |  GROUP BY word
         |)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  val oracle: Map[String, String] = Map(
    "bpe_train" -> withChain(
      (1 to K).map(i =>
        s"SELECT $i AS merge_rank, l, r, l || r AS merged, CAST(pair_count AS BIGINT) AS pair_count FROM best$i")
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", s"\n) ORDER BY merge_rank")),
    // the BIG_P-round prefix chain over the BIG_V-capped type table (prefix
    // equality — see bpeTrainBig's doc); the invariant booleans are asserted
    // literally, the approx_distinct precedent for engine-computed gates
    "bpe_train_big" -> withChain(
      (1 to BIG_P).map(i =>
        s"SELECT $i AS merge_rank, l, r, l || r AS merged, " +
          s"CAST(pair_count AS BIGINT) AS pair_count, " +
          "(SELECT CAST(count(*) AS BIGINT) FROM types) AS n_types, " +
          s"true AS term_ok, true AS closure_ok FROM best$i")
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", s"\n) ORDER BY merge_rank"),
      k = BIG_P, cap = BIG_V),
    "bpe_segment" -> withChain(
      s"""SELECT word, freq, CAST(len(toks) AS BIGINT) AS n_pieces,
         |  array_to_string(toks, ' ') AS pieces
         |FROM (SELECT * FROM seg$K ORDER BY freq DESC, word LIMIT 30)
         |ORDER BY freq DESC, word""".stripMargin),
    "bpe_encode" -> withChain(",\n" + encodeCtes + "\n" +
      s"""SELECT d.doc_id, count(*) AS n_tokens,
         |  CAST(sum(coalesce(p.k, 1)) AS BIGINT) AS n_pieces
         |FROM dtoks d LEFT JOIN
         |  (SELECT word, CAST(len(toks) AS BIGINT) AS k FROM eseg$K) p USING (word)
         |GROUP BY 1 ORDER BY doc_id ASC NULLS FIRST""".stripMargin)
  )
}
