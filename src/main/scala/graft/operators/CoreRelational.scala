package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Core relational operator inventory (SURVEY.md §2.1–§2.6).
  *
  * Each query re-expresses one operation the reference performs — scans with
  * pushed predicates (`agency.py:80-85`), inner joins (`agency.py:205-213`),
  * anti/semi joins (`route.py:76-78`, `agency.py:141-145`), preference-ordered
  * dedup (`agency.py:141-159`), distinct-on dedup (`agency.py:316-321`),
  * row-number enumeration (`route.py:121-128`) — as declarative Spark plans so
  * Catalyst handles pushdown, pruning and join strategy.
  *
  * Determinism contract: every output ends in a total `orderBy` whose ties are
  * identical rows, so results are stable under any parallelism; Catalyst's
  * `EliminateSorts` removes the sort when a consumer (e.g. Bench's `count()`)
  * doesn't need it. Scale contract: dimension joins broadcast the small side;
  * everything else is a single hash-partitioned shuffle on the grouping key.
  */
object CoreRelational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Total-order helper: asc-nulls-first on every listed column (matches the
    * `ASC NULLS FIRST` pinned in each oracle — Spark and DuckDB defaults differ).
    */
  private def ord(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(c => col(c).asc_nulls_first): _*)

  // S1: full-snapshot source scan (reference: agencyList GET, agency.py:13-17).
  private val scanSource: Q = (s, dir) =>
    ord(t(s, dir, "region").select("r_regionkey", "r_name"), "r_regionkey")

  // S5: scan with pushed predicate (reference: WHERE agency_id = %s, agency.py:80-85).
  private val filterScan: Q = (s, dir) =>
    ord(
      t(s, dir, "customer")
        .filter(col("c_nationkey") === 7)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
      "c_custkey")

  // S4: incremental offset scan (reference: vehicleLocations&t=lastTime, route.py:150-170).
  private val incrementalScan: Q = (s, dir) =>
    ord(
      t(s, dir, "events")
        .filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value"),
      "event_id")

  // G2: attribute projection + rename (reference: .get('tag') → column, route.py:27-34).
  private val project: Q = (s, dir) =>
    ord(
      t(s, dir, "orders")
        .select(col("o_orderkey").as("order_id"), col("o_orderpriority").as("priority")),
      "order_id")

  // G4/F7: boolean predicate parse (reference: attr == 'true', route.py:33,203).
  private val boolParse: Q = (s, dir) =>
    ord(
      t(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_orderstatus") === "F").as("is_final")),
      "o_orderkey")

  // F6: string → double cast (reference: float(secsSinceReport), route.py:166,202).
  private val castDouble: Q = (s, dir) =>
    ord(
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderkey").cast("string").cast("double").as("key_dbl")),
      "o_orderkey")

  // F5: string concat / format (reference: URL building, route.py:152-154).
  private val strConcat: Q = (s, dir) =>
    ord(
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          concat_ws("-", col("c_mktsegment"), col("c_nationkey")).as("seg_key")),
      "c_custkey")

  // J1: inner equi-join then filter (reference: service JOIN route USING(route_id)
  // WHERE agency_id, agency.py:205-213). Dims broadcast — no shuffle at scale.
  private val joinInner: Q = (s, dir) =>
    ord(
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select("c_custkey", "c_name", "n_name"),
      "c_custkey")

  // J4: left semi-join, existence probe (reference: agency.py:141-145).
  private val joinSemi: Q = (s, dir) =>
    ord(
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      "c_custkey")

  // J3/U2: left anti-join, set difference on key (reference: missing stops, route.py:76-78).
  private val joinAnti: Q = (s, dir) =>
    ord(
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      "c_custkey")

  // A1: distinct, set semantics (reference: set() of stop tags, route.py:76-78).
  private val distinctQ: Q = (s, dir) =>
    ord(t(s, dir, "customer").select("c_mktsegment").distinct(), "c_mktsegment")

  // U1: union all (reference: per-route row-list concat, agency.py:91,135).
  private val unionAll: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    ord(
      ev.filter(col("event_type") === "click").select("event_id", "event_type", "user_id")
        .union(ev.filter(col("event_type") === "view").select("event_id", "event_type", "user_id")),
      "event_id")
  }

  // U2: except / set difference (reference: all − body, route.py:76-78).
  private val exceptDiff: Q = (s, dir) =>
    ord(
      t(s, dir, "events").select(col("user_id"))
        .except(t(s, dir, "customer").filter(col("c_custkey") < 8).select(col("c_custkey").as("user_id"))),
      "user_id")

  // U2b: the BAG-semantics set operations (EXCEPT ALL / INTERSECT ALL) —
  // multiplicity-preserving difference and intersection, which the distinct
  // forms above cannot express (removing one occurrence per match matters
  // whenever rows are observations, not identities). Spark plans both as an
  // aggregate-of-counts + generate, all keyed on the row value — no join.
  private val exceptAll: Q = (s, dir) => {
    val ev = t(s, dir, "events").select((col("user_id") % 40).as("k"))
    val probe = t(s, dir, "customer").filter(col("c_custkey") < 100)
      .select((col("c_custkey") % 40).as("k"))
    ord(ev.exceptAll(probe).groupBy("k").agg(count(lit(1)).as("n")), "k")
  }

  private val intersectAll: Q = (s, dir) => {
    val ev = t(s, dir, "events").select((col("user_id") % 40).as("k"))
    val probe = t(s, dir, "customer").filter(col("c_custkey") < 100)
      .select((col("c_custkey") % 40).as("k"))
    ord(ev.intersectAll(probe).groupBy("k").agg(count(lit(1)).as("n")), "k")
  }

  // W2: total sort on composite key (reference: .sort(key=(tag,lon,lat,name,route_id)),
  // agency.py:146-151). (l_orderkey,l_linenumber,l_partkey,l_suppkey) is unique.
  private val sortMulti: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .orderBy(
        col("l_returnflag").asc_nulls_first, col("l_quantity").desc_nulls_last,
        col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
        col("l_partkey").asc_nulls_first, col("l_suppkey").asc_nulls_first)

  // W3: first-after-sort / top-k (reference: matching_stop_rows[0], agency.py:151).
  private val topkLimit: Q = (s, dir) =>
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      .limit(10)

  // W1: sequence enumeration per partition (reference: stop_order in document order,
  // route.py:121-128). (user_id, ts) unique in events ⇒ deterministic.
  private val windowRowNumber: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    ord(
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), row_number().over(w).as("rn")),
      "user_id", "rn")
  }

  // W4: latest-version selection (reference: max update_timestamp per service,
  // sql/create_tables.sql:92-99).
  private val windowLatest: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    ord(
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "ts", "value"),
      "user_id")
  }

  // A2: dedup with deterministic preference — argmin over a composite sort key
  // (reference: "Sort so that choice of stop is deterministic", agency.py:141-159).
  private val dedupArgmin: Q = (s, dir) => {
    val w = Window.partitionBy("c_nationkey", "c_mktsegment")
      .orderBy(col("c_acctbal").asc_nulls_first, col("c_custkey").asc_nulls_first)
    ord(
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("c_nationkey", "c_mktsegment", "c_custkey", "c_acctbal"),
      "c_nationkey", "c_mktsegment")
  }

  // A3: DISTINCT ON-style dedup per key, made deterministic with an explicit
  // tiebreak (reference: SELECT DISTINCT ON, agency.py:184-189,316-321).
  private val dedupKeys: Q = (s, dir) => {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("event_id").asc)
    ord(
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "value"),
      "user_id", "event_type")
  }

  // A4: grouped list collection (reference: per-route extend loops, agency.py:87-91);
  // sorted + joined to a string so the oracle compare is order-insensitive.
  private val collectListGroup: Q = (s, dir) =>
    ord(
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("line_numbers")),
      "l_orderkey")

  // S9: VALUES inline relation (reference: literal row batches fed to SQL,
  // agency.py:185-187). A literal frame is a first-class relation: joinable,
  // broadcastable, oracle-checkable.
  private val valuesInline: Q = (s, dir) => {
    val session = s
    import session.implicits._
    val codes = Seq((0, "AFR"), (1, "AMR"), (2, "ASI"), (3, "EUR"), (4, "MEA"))
      .toDF("r_regionkey", "code")
    ord(
      t(s, dir, "region").join(broadcast(codes), Seq("r_regionkey"), "inner")
        .select("r_regionkey", "r_name", "code"),
      "r_regionkey")
  }

  // G3: deterministic surrogate key — the engine's replacement for the
  // reference's uuid4 mint (agency.py:52, route.py:28): sha256 over the
  // natural key, reproducible on both engines and across retries.
  private val surrogateKey: Q = (s, dir) =>
    ord(
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          sha2(concat_ws("|", col("n_nationkey"), col("n_name")), 256).as("nation_sk")),
      "n_nationkey")

  // A5: count-gated write (reference: only INSERT when ≥1 row, agency.py:301-303)
  // — the gate is a broadcast scalar, not a driver-side collect.
  private val countGate: Q = (s, dir) => {
    val src = t(s, dir, "events").filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
    val gate = src.agg(count(lit(1)).as("n_src"))
    ord(
      src.crossJoin(broadcast(gate)).filter(col("n_src") > 0)
        .select("event_id", "user_id", "value"),
      "event_id")
  }

  val queries: Map[String, Q] = Map(
    "values_inline" -> valuesInline,
    "surrogate_key" -> surrogateKey,
    "count_gate" -> countGate,
    "scan_source" -> scanSource,
    "filter_scan" -> filterScan,
    "incremental_scan" -> incrementalScan,
    "project" -> project,
    "bool_parse" -> boolParse,
    "cast_double" -> castDouble,
    "str_concat" -> strConcat,
    "join_inner" -> joinInner,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "distinct" -> distinctQ,
    "union_all" -> unionAll,
    "except_all" -> exceptAll,
    "intersect_all" -> intersectAll,
    "except_diff" -> exceptDiff,
    "sort_multi" -> sortMulti,
    "topk_limit" -> topkLimit,
    "window_row_number" -> windowRowNumber,
    "window_latest" -> windowLatest,
    "dedup_argmin" -> dedupArgmin,
    "dedup_keys" -> dedupKeys,
    "collect_list_group" -> collectListGroup
  )

  val oracle: Map[String, String] = Map(
    "values_inline" ->
      """SELECT r.r_regionkey, r.r_name, v.code
        |FROM region r
        |JOIN (VALUES (0,'AFR'),(1,'AMR'),(2,'ASI'),(3,'EUR'),(4,'MEA')) AS v(r_regionkey, code)
        |  ON r.r_regionkey = v.r_regionkey
        |ORDER BY r.r_regionkey ASC NULLS FIRST""".stripMargin,
    "surrogate_key" ->
      """SELECT n_nationkey, sha256(concat_ws('|', n_nationkey, n_name)) AS nation_sk
        |FROM nation ORDER BY n_nationkey ASC NULLS FIRST""".stripMargin,
    "count_gate" ->
      """WITH src AS (
        |  SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'),
        |gate AS (SELECT count(*) AS n_src FROM src)
        |SELECT event_id, user_id, value FROM src CROSS JOIN gate WHERE n_src > 0
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "scan_source" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey ASC NULLS FIRST",
    "filter_scan" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        |WHERE c_nationkey = 7 ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "incremental_scan" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE ts > TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "project" ->
      "SELECT o_orderkey AS order_id, o_orderpriority AS priority FROM orders ORDER BY order_id ASC NULLS FIRST",
    "bool_parse" ->
      "SELECT o_orderkey, (o_orderstatus = 'F') AS is_final FROM orders ORDER BY o_orderkey ASC NULLS FIRST",
    "cast_double" ->
      """SELECT o_orderkey, CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) AS key_dbl
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "str_concat" ->
      """SELECT c_custkey, concat_ws('-', c_mktsegment, c_nationkey) AS seg_key
        |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "join_inner" ->
      """SELECT c_custkey, c_name, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment ASC NULLS FIRST",
    "union_all" ->
      """SELECT event_id, event_type, user_id FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, event_type, user_id FROM events WHERE event_type = 'view'
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "except_all" ->
      """WITH a AS (SELECT user_id % 40 AS k FROM events),
        |b AS (SELECT c_custkey % 40 AS k FROM customer WHERE c_custkey < 100)
        |SELECT k, count(*) AS n FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
        |GROUP BY k ORDER BY k ASC NULLS FIRST""".stripMargin,
    "intersect_all" ->
      """WITH a AS (SELECT user_id % 40 AS k FROM events),
        |b AS (SELECT c_custkey % 40 AS k FROM customer WHERE c_custkey < 100)
        |SELECT k, count(*) AS n FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        |GROUP BY k ORDER BY k ASC NULLS FIRST""".stripMargin,
    "except_diff" ->
      """SELECT user_id FROM events
        |EXCEPT
        |SELECT c_custkey AS user_id FROM customer WHERE c_custkey < 8
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "sort_multi" ->
      """SELECT l_returnflag, l_linestatus, l_quantity, l_orderkey, l_linenumber, l_partkey, l_suppkey
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_returnflag ASC NULLS FIRST, l_quantity DESC NULLS LAST,
        |  l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |  l_partkey ASC NULLS FIRST, l_suppkey ASC NULLS FIRST""".stripMargin,
    "topk_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST LIMIT 10""".stripMargin,
    "window_row_number" ->
      """SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |FROM events ORDER BY user_id ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,
    "window_latest" ->
      """SELECT user_id, event_id, ts, value FROM (
        |  SELECT user_id, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "dedup_argmin" ->
      """SELECT c_nationkey, c_mktsegment, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC NULLS FIRST) AS rn
        |  FROM customer) WHERE rn = 1
        |ORDER BY c_nationkey ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin,
    "dedup_keys" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id ASC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,
    "collect_list_group" ->
      """SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey ASC NULLS FIRST""".stripMargin
  )
}
