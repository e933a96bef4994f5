package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Data-quality expectations — the reference's constraint system, re-expressed
  * as a distributed audit.
  *
  * The reference enforces correctness ONLY through Postgres DDL: primary keys
  * (create_tables.sql:19-20,33-34,54-55,76-77), foreign keys (:35-37,56-58,
  * 78-80,100-105,122-124), unique expression indexes (:38-39,62-63,85-86,
  * 108-109) and `CHECK (stop_order > 0)` (:106-107). A lake table has no
  * server to reject bad rows, so the equivalent engine feature is an
  * EXPECTATIONS AUDIT: declare the same constraint classes (FK integrity, key
  * uniqueness, not-null, value range, categorical domain) and compute a
  * violations report in one job — the pattern the lakehouse DQ frameworks
  * (Deequ-style expectations) ship.
  *
  * Each rule yields one row (rule, checked, violations); `audit` unions them
  * and stamps `pass = violations == 0`.
  *
  * Scale design: each rule is an independent scan + conditional partial
  * aggregate — map-side combine reduces every partition to one row before the
  * single-row exchange. FK rules LEFT-join the fact against the DISTINCT key
  * set of the referenced dimension: broadcast when the dimension is small,
  * a plain keyed shuffle join when not — never a collect. Uniqueness checks
  * are count - count(distinct) (no self-join). The rule frames union into one
  * result, so the whole audit is one Spark job scanning each table once per
  * rule family.
  */
object Quality {

  /** Predicate rule: rows of `df` where `violated` holds break the expectation. */
  def check(name: String, df: DataFrame, violated: Column): DataFrame =
    df.agg(
      count(lit(1)).as("checked"),
      count(when(violated, lit(1))).as("violations"))
      .select(lit(name).as("rule"), col("checked"), col("violations"))

  /** Referential integrity: every `factKey` must resolve in `dim.dimKey`.
    * NULL fact keys count as violations (the reference's FK columns are all
    * NOT NULL, so an unresolvable or missing key is equally broken).
    */
  def fkCheck(name: String, fact: DataFrame, factKey: String,
              dim: DataFrame, dimKey: String): DataFrame = {
    val marker = s"_dq_$dimKey"
    check(name,
      fact.join(dim.select(col(dimKey).as(marker)).distinct(),
        col(factKey) === col(marker), "left"),
      col(marker).isNull)
  }

  /** Key uniqueness without a self-join: dupes = count - count(distinct).
    * Note count(distinct c1, c2) skips rows with a NULL component on both
    * engines' Spark side; pair with not-null rules on the key columns.
    */
  def uniqueCheck(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("checked"),
      (count(lit(1)) - count_distinct(col(keyCols.head), keyCols.tail.map(col): _*))
        .as("violations"))
      .select(lit(name).as("rule"), col("checked"), col("violations"))

  /** Union the per-rule rows into the audit report. */
  def audit(rules: Seq[DataFrame]): DataFrame =
    rules.reduce(_ unionAll _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("rule").asc_nulls_first)

  /** Row-level complement of the audit: ROUTE the failing rows, tagged by
    * the rule they break — what a lake pipeline writes to its quarantine
    * table while the clean rows continue (the reject-channel pattern; the
    * reference's Postgres would have rejected these at INSERT). A row
    * breaking several rules appears once per rule. Each predicate rule is a
    * map-side filter over the scan; set-shaped rules (duplicate keys) ride
    * one keyed window exchange.
    */
  def quarantine(df: DataFrame, idCol: String,
                 rules: Seq[(String, Column)]): DataFrame =
    rules.map { case (name, violated) =>
      df.filter(violated).select(lit(name).as("rule"), col(idCol))
    }.reduce(_ unionAll _)

  private val dqQuarantine: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    // duplicate-fingerprint membership is row-level uniqueness: every row of
    // a fingerprint that occurs more than once quarantines (first included —
    // which copy survives is a dedup policy, not a DQ verdict)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
    val withDup = docs.withColumn("_fpn", count(lit(1)).over(w))
    quarantine(withDup, "doc_id", Seq(
      "domain_lang" -> !col("lang").isin("en", "de", "fr", "es"),
      "len_mismatch" -> (col("n_chars") =!= length(col("text"))),
      "short_text" -> (col("n_chars") < 30),
      "dup_fingerprint" -> (col("_fpn") > 1)))
      .orderBy(col("rule").asc_nulls_first, col("doc_id").asc_nulls_first)
  }

  private val dqCheck: Q = (s, dir) => {
    val orders = Tables(s, dir, "orders")
    val lineitem = Tables(s, dir, "lineitem")
    val customer = Tables(s, dir, "customer")
    val events = Tables(s, dir, "events")
    val documents = Tables(s, dir, "documents")
    audit(Seq(
      fkCheck("fk_orders_customer", orders, "o_custkey", customer, "c_custkey"),
      fkCheck("fk_lineitem_orders", lineitem, "l_orderkey", orders, "o_orderkey"),
      uniqueCheck("pk_customer_unique", customer, Seq("c_custkey")),
      uniqueCheck("uq_events_user_ts", events, Seq("user_id", "ts")),
      check("notnull_events_user", events, col("user_id").isNull),
      check("range_events_value", events, col("value") <= 0.0 || col("value") > 1000.0),
      check("domain_documents_lang", documents, !col("lang").isin("en", "de", "fr", "es"))
    ))
  }

  /** K-anonymous aggregate release — the governance cousin of
    * `text_pii_scrub`: a stats table published per (lang, source) must not
    * expose groups small enough to identify members, so groups under K
    * generalize into an 'other' bucket before release (suppression by
    * generalization, the k-anonymity recipe for aggregate tables). Shape:
    * one grouped partial aggregate, a per-group size gate, and ONE
    * re-aggregation of only the generalized rows — the big groups pass
    * through untouched, so the second exchange carries O(rare groups).
    * n_chars is integral, so a plain BIGINT sum is already exact on both
    * engines (no double→decimal window — see graft.Micro for the double
    * case); headroom: overflow needs ~9.2e18 chars in one (lang, source)
    * group, ~10⁵× the whole 100 TB corpus.
    */
  private val ANON_K = 10
  private val dqAnonRelease: Q = (s, dir) => {
    val g = Tables(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"))
    val gated = g.select(
      when(col("n_docs") >= ANON_K, col("lang")).otherwise(lit("other")).as("lang"),
      when(col("n_docs") >= ANON_K, col("source")).otherwise(lit("other")).as("source"),
      col("n_docs"), col("sum_chars"))
    gated.groupBy(col("lang"), col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        (sum(col("sum_chars")).cast("double") / sum(col("n_docs"))).as("avg_chars"))
      // the merged 'other' bucket must ITSELF meet K or be suppressed —
      // releasing a 3-member 'other' row would leak exactly the small-group
      // statistics the generalization exists to hide
      .filter(col("n_docs") >= ANON_K)
      .select(col("lang"), col("source"), col("n_docs"),
        round(col("avg_chars"), 6).as("avg_chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
  }

  // ---- dq_benford: first-digit distribution audit --------------------------
  //
  // Benford's law — leading digits of naturally-occurring amounts follow
  // P(d) = log10(1 + 1/d) — is the standard forensic screen for fabricated
  // or truncated monetary columns (auditing, fraud, ETL bugs that clamp or
  // default values). The audit emits, per digit 1..9, the observed share,
  // the Benford expectation, and the absolute deviation; a consumer alerts
  // on max deviation or a chi-square over these rows.
  //
  // Scale: one grouped count over the scan (9 groups, map-side partials)
  // plus a broadcast of the 1-row total — no data-proportional shuffle.
  // Determinism: the leading digit comes from the INTEGER cents rendering
  // (floor(price·100 + 0.5) as BIGINT → first character), not from
  // float log10/pow, so digit extraction is bit-portable; the only float
  // ops are two divisions and a log10 of a 9-value rational, all round(6).
  private val dqBenford: Q = (s, dir) => {
    val cents = floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
    val counts = Tables(s, dir, "lineitem")
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    // grand total as an unpartitioned window over the NINE aggregate rows —
    // an agg-subtree + crossJoin(broadcast(...)) would re-evaluate the whole
    // grouped scan a second time (the multi-consumer recompute pathology:
    // measured 2 scans of lineitem in the physical plan); the window's
    // single-partition exchange moves 9 rows
    counts
      .withColumn("_total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("observed_p", round(col("n").cast("double") / col("_total"), 6))
      .withColumn("expected_p", round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .select(col("digit"), col("n"), col("observed_p"), col("expected_p"),
        round(abs(col("observed_p") - col("expected_p")), 6).as("abs_dev"))
      .orderBy(col("digit").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "dq_check" -> dqCheck,
    "dq_quarantine" -> dqQuarantine,
    "dq_anon_release" -> dqAnonRelease,
    "dq_benford" -> dqBenford
  )

  val oracle: Map[String, String] = Map(
    "dq_check" ->
      """WITH r AS (
        |  SELECT 'fk_orders_customer' AS rule, count(*) AS checked,
        |         count(*) FILTER (WHERE c.c_custkey IS NULL) AS violations
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders', count(*),
        |         count(*) FILTER (WHERE o.o_orderkey IS NULL)
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'pk_customer_unique', count(*),
        |         count(*) - count(DISTINCT c_custkey) FROM customer
        |  UNION ALL
        |  SELECT 'uq_events_user_ts', count(*),
        |         count(*) - count(DISTINCT (user_id, ts)) FROM events
        |  UNION ALL
        |  SELECT 'notnull_events_user', count(*),
        |         count(*) FILTER (WHERE user_id IS NULL) FROM events
        |  UNION ALL
        |  SELECT 'range_events_value', count(*),
        |         count(*) FILTER (WHERE value <= 0.0 OR value > 1000.0) FROM events
        |  UNION ALL
        |  SELECT 'domain_documents_lang', count(*),
        |         count(*) FILTER (WHERE lang NOT IN ('en','de','fr','es'))
        |  FROM documents)
        |SELECT rule, CAST(checked AS BIGINT) AS checked,
        |       CAST(violations AS BIGINT) AS violations,
        |       violations = 0 AS pass
        |FROM r ORDER BY rule ASC NULLS FIRST""".stripMargin,
    "dq_quarantine" ->
      """WITH fp AS (
        |  SELECT doc_id, lang, n_chars, text,
        |    count(*) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS fpn
        |  FROM documents),
        |q AS (
        |  SELECT 'domain_lang' AS rule, doc_id FROM fp
        |  WHERE lang NOT IN ('en','de','fr','es')
        |  UNION ALL
        |  SELECT 'len_mismatch', doc_id FROM fp WHERE n_chars <> len(text)
        |  UNION ALL
        |  SELECT 'short_text', doc_id FROM fp WHERE n_chars < 30
        |  UNION ALL
        |  SELECT 'dup_fingerprint', doc_id FROM fp WHERE fpn > 1)
        |SELECT rule, doc_id FROM q
        |ORDER BY rule ASC NULLS FIRST, doc_id ASC NULLS FIRST""".stripMargin,
    "dq_anon_release" ->
      s"""WITH g AS (
         |  SELECT lang, source, count(*) AS n_docs,
         |    sum(CAST(n_chars AS BIGINT)) AS sum_chars
         |  FROM documents GROUP BY lang, source),
         |gated AS (
         |  SELECT CASE WHEN n_docs >= $ANON_K THEN lang ELSE 'other' END AS lang,
         |         CASE WHEN n_docs >= $ANON_K THEN source ELSE 'other' END AS source,
         |         n_docs, sum_chars
         |  FROM g)
         |SELECT lang, source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  round(CAST(sum(sum_chars) AS DOUBLE) / CAST(sum(n_docs) AS BIGINT), 6) AS avg_chars
         |FROM gated GROUP BY lang, source
         |HAVING sum(n_docs) >= $ANON_K
         |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin,
    "dq_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |                          AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem),
        |c AS (
        |  SELECT digit, count(*) AS n FROM d
        |  WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        |p AS (
        |  SELECT digit, n,
        |    round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
        |    round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected_p
        |  FROM c CROSS JOIN t)
        |SELECT digit, n, observed_p, expected_p,
        |  round(abs(observed_p - expected_p), 6) AS abs_dev
        |FROM p ORDER BY digit ASC NULLS FIRST""".stripMargin
  )
}
