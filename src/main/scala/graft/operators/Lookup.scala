package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Lookup joins, row generation, backfill and key normalization
  * (SURVEY.md §2.2 G1/G5–G8, §2.3 J2/J5).
  *
  * The reference resolves a vehicle's `dirTag` through a two-level dictionary
  * chain — route-scoped, then agency-wide, else drop with a warning
  * (`route.py:183-194`, dicts built at `agency.py:264,278-280`). Dict probes
  * are hand-rolled broadcast hash joins; here they are literal `broadcast()`
  * left joins with a `coalesce` fallback, so at cluster scale the fact stream
  * never shuffles for dimension resolution.
  */
object Lookup {

  private def ord(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(c => col(c).asc_nulls_first): _*)

  /** The two broadcast lookup sides. Primary ≙ route-scoped dict (partial
    * coverage), fallback ≙ agency-wide dict (wider but still partial) — so the
    * testdata exercises hit-primary / hit-fallback / drop, like the reference.
    */
  private def lookups(s: SparkSession, dir: String): (DataFrame, DataFrame) = (
    Tables(s, dir, "customer").filter(col("c_custkey") < 8)
      .select(col("c_custkey").as("pk"), col("c_name").as("primary_name")),
    Tables(s, dir, "nation").filter(col("n_nationkey") < 12)
      .select(col("n_nationkey").as("fk"), col("n_name").as("fallback_name"))
  )

  // J2: lookup join with 2-level fallback chain (route.py:183-194).
  private val joinLookupFallback: Q = (s, dir) => {
    val (primary, fallback) = lookups(s, dir)
    ord(
      Tables(s, dir, "events")
        .join(broadcast(primary), col("user_id") === col("pk"), "left")
        .join(broadcast(fallback), col("user_id") === col("fk"), "left")
        .withColumn("resolved", coalesce(col("primary_name"), col("fallback_name")))
        .filter(col("resolved").isNotNull)
        .select("event_id", "user_id", "resolved"),
      "event_id")
  }

  // G6: the rows the chain drops (reference prints a warning per drop).
  private val filterUnmatched: Q = (s, dir) => {
    val (primary, fallback) = lookups(s, dir)
    ord(
      Tables(s, dir, "events")
        .join(broadcast(primary), col("user_id") === col("pk"), "left")
        .join(broadcast(fallback), col("user_id") === col("fk"), "left")
        .filter(coalesce(col("primary_name"), col("fallback_name")).isNull)
        .select("event_id", "user_id"),
      "event_id")
  }

  // G1: document → rows in document order (XML explode, route.py:27-34,64-71;
  // document position ≙ posexplode index, the basis of W1's stop_order).
  private val explodeGen: Q = (s, dir) =>
    ord(
      Tables(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word")),
      "doc_id", "pos")

  // G5: synthetic row injection — one NULL-tag row per group ("vehicles not
  // running a service", route.py:35-37).
  private val unionInject: Q = (s, dir) => {
    val n = Tables(s, dir, "nation")
    ord(
      n.select(col("n_nationkey"), col("n_name"))
        .union(n.select(col("n_nationkey"), lit(null).cast("string").as("n_name"))),
      "n_nationkey", "n_name")
  }

  // G7: null-safe key normalization — COALESCE(tag,'') as grouping key
  // (agency.py:100; unique index sql/create_tables.sql:60-63).
  private val nullsafeKey: Q = (s, dir) =>
    ord(
      Tables(s, dir, "customer")
        .groupBy(coalesce(expr("nullif(c_mktsegment, 'BUILDING')"), lit("")).as("seg_key"))
        .agg(count(lit(1)).as("cnt")),
      "seg_key")

  // G8: text form of a composite value as dedup key — TEXT(location)
  // (sql/create_tables.sql:86; agency.py:188). Canonical JSON of the struct.
  private val castStringKey: Q = (s, dir) =>
    ord(
      Tables(s, dir, "customer")
        .select(to_json(struct(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))).as("key"))
        .distinct(),
      "key")

  // J5: backfill from the deterministically-best same-key row (missing stops
  // copy name/lon/lat from the argmin stop, agency.py:141-170).
  private val joinBackfill: Q = (s, dir) => {
    val base = Tables(s, dir, "customer")
      .withColumn("acct",
        when(col("c_custkey") % 7 === 0, lit(null).cast("double")).otherwise(col("c_acctbal")))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("acct").asc_nulls_first, col("c_custkey").asc_nulls_first)
    val best = base.filter(col("acct").isNotNull)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("c_nationkey").as("bnk"), col("acct").as("best_acct"))
    ord(
      base.join(broadcast(best), col("c_nationkey") === col("bnk"), "left")
        .select(
          col("c_custkey"), col("c_nationkey"),
          coalesce(col("acct"), col("best_acct")).as("filled_acctbal"),
          col("acct").isNull.as("was_missing")),
      "c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "join_lookup_fallback" -> joinLookupFallback,
    "filter_unmatched" -> filterUnmatched,
    "explode_gen" -> explodeGen,
    "union_inject" -> unionInject,
    "nullsafe_key" -> nullsafeKey,
    "cast_string_key" -> castStringKey,
    "join_backfill" -> joinBackfill
  )

  val oracle: Map[String, String] = Map(
    "join_lookup_fallback" ->
      """SELECT event_id, user_id, COALESCE(p.c_name, f.n_name) AS resolved
        |FROM events e
        |LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 8) p
        |  ON e.user_id = p.c_custkey
        |LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 12) f
        |  ON e.user_id = f.n_nationkey
        |WHERE COALESCE(p.c_name, f.n_name) IS NOT NULL
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "filter_unmatched" ->
      """SELECT event_id, user_id
        |FROM events e
        |LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 8) p
        |  ON e.user_id = p.c_custkey
        |LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 12) f
        |  ON e.user_id = f.n_nationkey
        |WHERE COALESCE(p.c_name, f.n_name) IS NULL
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "explode_gen" ->
      """SELECT doc_id,
        |  unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
        |  unnest(string_split(text, ' ')) AS word
        |FROM documents WHERE doc_id < 100
        |ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin,
    "union_inject" ->
      """SELECT n_nationkey, n_name FROM nation
        |UNION ALL
        |SELECT n_nationkey, CAST(NULL AS VARCHAR) AS n_name FROM nation
        |ORDER BY n_nationkey ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "nullsafe_key" ->
      """SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '') AS seg_key, count(*) AS cnt
        |FROM customer GROUP BY 1 ORDER BY seg_key ASC NULLS FIRST""".stripMargin,
    "cast_string_key" ->
      """SELECT DISTINCT CAST(to_json(struct_pack(nk := c_nationkey, seg := c_mktsegment)) AS VARCHAR) AS key
        |FROM customer ORDER BY key ASC NULLS FIRST""".stripMargin,
    "join_backfill" ->
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS acct
        |  FROM customer),
        |best AS (
        |  SELECT c_nationkey AS bnk, acct AS best_acct FROM (
        |    SELECT c_nationkey, acct,
        |      row_number() OVER (PARTITION BY c_nationkey
        |        ORDER BY acct ASC NULLS FIRST, c_custkey ASC NULLS FIRST) AS rn
        |    FROM base WHERE acct IS NOT NULL) WHERE rn = 1)
        |SELECT c_custkey, c_nationkey,
        |  COALESCE(acct, best_acct) AS filled_acctbal,
        |  (acct IS NULL) AS was_missing
        |FROM base LEFT JOIN best ON c_nationkey = bnk
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin
  )
}
