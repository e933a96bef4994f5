#!/usr/bin/env python3
"""Full-VALUE sf10 grade for dedup_hamming_clusters without the quadratic
oracle (round-20 close-out: the lane was a NAMED sf10 exclusion because its
DuckDB oracle's recursive min-label closure is Omega(component^2) rows —
organic sf10 replica sigs merge into large components and two attempts
exceeded 2h CPU while the ENGINE produced the output in 208 s).

This grader replaces ONLY the recursive `walk` CTE with an O(E alpha)
union-find in Python; every other stage is the byte-identical oracle SQL
from DedupText.oracle (same md5 token hashes, same 60-bit majority simhash,
same fold-to-min-doc reps, same 61-element radius-1 ball + midpoint
equi-join edge set). Union-find with min-label per component computes the
SAME comp(rep -> min doc in component) relation the recursive CTE converges
to — the engine's large-star/small-star CC also converges to min-label, so
the final expanded (doc_id, cluster) rowsets must match EXACTLY. Compare is
check.py's engine-side protocol: counts + EXCEPT ALL both directions.

Usage: sf10_hamclusters_grade.py <sfDir> <clustersParquetDir> [jsonOut]
Exit 0 iff the full rowset matches.
"""
import json
import sys

import duckdb

HAM_K = 2
SIM_BITS = 60

sf, out = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()

bits = " + ".join(
    f"CASE WHEN 2*len(list_filter(hs, h -> (h >> {b}) % 2 = 1)) >= len(hs) "
    f"THEN {1 << b} ELSE 0 END" for b in range(SIM_BITS))

con.execute(f"""CREATE TABLE sg AS
  WITH hs AS (
    SELECT doc_id,
      list_transform(list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
                     t -> CAST(('0x'||substr(md5('0:'||t),1,15)) AS BIGINT)) AS hs
    FROM read_parquet('{sf}/documents.parquet'))
  SELECT doc_id, ({bits}) AS sig FROM hs WHERE len(hs) > 0""")
con.execute("CREATE TABLE sn AS SELECT min(doc_id) AS doc_id, sig FROM sg GROUP BY sig")
n_docs, n_sigs = con.execute(
    "SELECT (SELECT count(*) FROM sg), (SELECT count(*) FROM sn)").fetchone()
print(f"fold: {n_docs} docs -> {n_sigs} distinct sigs", flush=True)

# rep edges: the exact ball-join candidate set + <= HAM_K verify (oracle SQL
# verbatim; tractable — midpoint groups are <= 61 rows by construction)
edges = con.execute(f"""
  WITH mid AS (
    SELECT doc_id, sig, xor(sig, u.m) AS mid
    FROM sn, UNNEST(list_prepend(0::BIGINT,
      list_transform(range(0, {SIM_BITS}), i -> (1::BIGINT << i)))) AS u(m))
  SELECT DISTINCT a.doc_id, b.doc_id
  FROM mid a JOIN mid b ON a.mid = b.mid AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig, b.sig)) <= {HAM_K}""").fetchall()
print(f"rep edges: {len(edges)}", flush=True)

# union-find, min-label per component — O(E alpha) where the recursive CTE
# is Omega(component^2)
parent = {}


def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != r:
        parent[x], x = r, parent[x]
    return r


for a, b in edges:
    ra, rb = find(a), find(b)
    if ra != rb:
        # union by min-label: smaller doc_id becomes the root, so the root
        # IS the component's cluster label (matches CC's min-label fixpoint)
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo

comp = [(x, find(x)) for x in parent]
n_comps = len({c for _, c in comp})
print(f"components: {n_comps} over {len(comp)} reps-with-edges", flush=True)
con.execute("CREATE TABLE comp (rep BIGINT, cluster BIGINT)")
con.executemany("INSERT INTO comp VALUES (?, ?)", comp) if comp else None

# membership expansion — oracle SQL verbatim
con.execute("""CREATE TABLE oracle AS
  SELECT g.doc_id AS doc_id, coalesce(c.cluster, n.doc_id) AS cluster
  FROM sg g JOIN sn n USING (sig) LEFT JOIN comp c ON n.doc_id = c.rep""")

# check.py's engine-side compare: counts + EXCEPT ALL both ways
sq = f"SELECT doc_id, cluster FROM read_parquet('{out}/*.parquet')"
oq = "SELECT doc_id, cluster FROM oracle"
n_s = con.execute(f"SELECT count(*) FROM ({sq})").fetchone()[0]
n_o = con.execute(f"SELECT count(*) FROM ({oq})").fetchone()[0]
d1 = con.execute(f"SELECT count(*) FROM (({sq}) EXCEPT ALL ({oq}))").fetchone()[0]
d2 = con.execute(f"SELECT count(*) FROM (({oq}) EXCEPT ALL ({sq}))").fetchone()[0]
ok = n_s == n_o and d1 == 0 and d2 == 0
print(f"{'ok  ' if ok else 'FAIL'} dedup_hamming_clusters: spark {n_s} vs "
      f"oracle {n_o} rows (spark-only {d1}, oracle-only {d2})")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"status": "ok" if ok else "fail", "rows": n_s,
                   "oracle_rows": n_o, "spark_only": d1, "oracle_only": d2,
                   "rep_edges": len(edges), "components": n_comps,
                   "method": "unionfind-closure"}, f, indent=1)
sys.exit(0 if ok else 1)
