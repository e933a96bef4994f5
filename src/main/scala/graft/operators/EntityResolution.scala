package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Entity resolution / fuzzy string matching — the data-cleaning family
  * (record linkage, master-data matching) the dedup module's hash-based
  * operators can't express: here similarity is EDIT DISTANCE, which has no
  * exact LSH, so the scalable shape is candidate BLOCKING (an equi-join on
  * a cheap key that provably contains every true match) followed by
  * per-candidate verification with the exact distance.
  *
  * Scale design: blocking is the whole game at 100 TB. Both operators block
  * on a shared name prefix — an equi-join whose candidate count is
  * Σ block² (tunable by prefix length), never the n² all-pairs — and
  * levenshtein runs only on candidates, per-row in codegen. The probe/dirty
  * side is the small side and broadcasts; the master scan streams. The
  * prefix length is the recall/cost dial: a prefix of length L misses edits
  * inside the first L characters BY DESIGN (documented contract, same as
  * every production blocking scheme; multi-pass blocking on several keys is
  * the standard recall fix and composes here as a union of blocked joins).
  */
object EntityResolution {

  /** Blocking key: the first 16 chars of c_name ("Customer#" + 7 of the 9
    * digits) — candidates agree everywhere except the last two digits. */
  private val BlockLen = 16

  private def customers(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "customer").select(col("c_custkey"), col("c_name"))

  // ---- fuzzy_name_match: probe names against the catalog, edit dist <= 1 --
  //
  // The self-join form: for each probe name, every catalog name within edit
  // distance 1 (excluding itself). Blocked on the 16-char prefix; the probe
  // set is a bounded id list (same discipline as the ANN probes).
  private val fuzzyNameMatch: Q = (s, dir) => {
    val all = customers(s, dir)
      .withColumn("blk", substring(col("c_name"), 1, BlockLen))
    val probes = all.filter(col("c_custkey") % 500 === 0)
      .select(col("c_custkey").as("probe_key"), col("c_name").as("probe_name"),
        col("blk"))
    all.join(broadcast(probes), Seq("blk"))
      .filter(col("c_custkey") =!= col("probe_key"))
      .withColumn("dist", levenshtein(col("c_name"), col("probe_name")))
      .filter(col("dist") <= 1)
      .select(col("probe_key"), col("c_custkey").as("match_key"), col("dist"))
      .orderBy(col("probe_key").asc_nulls_first, col("match_key").asc_nulls_first)
  }

  // ---- er_master_match: resolve dirty records against the master catalog --
  //
  // The master-data shape: a stream of DIRTY records (here: planted
  // one-character corruptions of every 100th customer name, the fixture
  // discipline of text_pii_scrub) must each resolve to its master record.
  // Blocked candidates, exact-distance verify, then a deterministic best
  // pick per dirty record: min (distance, master key) — the argmin dedup
  // pattern (A2) applied to match ranking.
  private val erMasterMatch: Q = (s, dir) => {
    val master = customers(s, dir)
      .withColumn("blk", substring(col("c_name"), 1, BlockLen))
    // planted dirty feed: last character corrupted to 'X'
    val dirty = customers(s, dir)
      .filter(col("c_custkey") % 100 === 0)
      .select(col("c_custkey").as("dirty_id"),
        concat(substring(col("c_name"), 1, 17), lit("X")).as("dirty_name"))
      .withColumn("blk", substring(col("dirty_name"), 1, BlockLen))
    val w = Window.partitionBy("dirty_id").orderBy(col("dist").asc, col("c_custkey").asc)
    master.join(broadcast(dirty), Seq("blk"))
      .withColumn("dist", levenshtein(col("c_name"), col("dirty_name")))
      .filter(col("dist") <= 1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("dirty_id"), col("c_custkey").as("master_key"), col("dist"))
      .orderBy(col("dirty_id").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "fuzzy_name_match" -> fuzzyNameMatch,
    "er_master_match" -> erMasterMatch
  )

  val oracle: Map[String, String] = Map(
    "fuzzy_name_match" ->
      s"""WITH all_c AS (
         |  SELECT c_custkey, c_name, substr(c_name, 1, $BlockLen) AS blk FROM customer),
         |probes AS (
         |  SELECT c_custkey AS probe_key, c_name AS probe_name, blk
         |  FROM all_c WHERE c_custkey % 500 = 0)
         |SELECT probe_key, a.c_custkey AS match_key,
         |  CAST(levenshtein(a.c_name, p.probe_name) AS INT) AS dist
         |FROM all_c a JOIN probes p USING (blk)
         |WHERE a.c_custkey <> p.probe_key
         |  AND levenshtein(a.c_name, p.probe_name) <= 1
         |ORDER BY probe_key ASC NULLS FIRST, match_key ASC NULLS FIRST""".stripMargin,
    "er_master_match" ->
      s"""WITH master AS (
         |  SELECT c_custkey, c_name, substr(c_name, 1, $BlockLen) AS blk FROM customer),
         |dirty AS (
         |  SELECT c_custkey AS dirty_id,
         |    substr(c_name, 1, 17) || 'X' AS dirty_name,
         |    substr(c_name, 1, $BlockLen) AS blk
         |  FROM customer WHERE c_custkey % 100 = 0),
         |cand AS (
         |  SELECT d.dirty_id, m.c_custkey,
         |    CAST(levenshtein(m.c_name, d.dirty_name) AS INT) AS dist
         |  FROM master m JOIN dirty d USING (blk)
         |  WHERE levenshtein(m.c_name, d.dirty_name) <= 1)
         |SELECT dirty_id, c_custkey AS master_key, dist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY dirty_id
         |    ORDER BY dist ASC, c_custkey ASC) AS rn
         |  FROM cand) WHERE rn = 1
         |ORDER BY dirty_id ASC NULLS FIRST""".stripMargin
  )
}
