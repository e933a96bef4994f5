#!/usr/bin/env python3
"""Planted containment-recall grade at the 5M-doc third decade (round-20
close-out: dedup_containment was the last dedup family with no 5M-doc
recall number — word 0.905, char 0.890, hamming-cluster 53/53, embedding
0.930 all had theirs).

Ground truth first, like sf100_recall.py: each planted (snippet 4p,
host 4p+2) pair's EXACT containment C = |A∩B|/min(|A|,|B|) over the
graded oracle's hashed word-3-shingle sets, denominator = pairs clearing
CONTAIN_TAU. The lane's guarantee is EXACT recall for pairs sharing >= 1
RARE gram (corpus df <= DF_MAX) — so the grade also computes each planted
pair's true rare-shared-gram count against the FULL 5.4M-doc corpus (the
df scan is restricted to the planted docs' ~30k distinct grams via a
semi-join — no full-corpus gram materialization), splits the denominator
into reachable/unreachable, and HARD-ASSERTS recall 1.0 on the reachable
half; the unreachable count is the DF_MAX-bound argument's measured price.

Usage: sf100_contain_recall.py <sfDir> <containOutDir>
"""
import sys

import duckdb

PLANT_BASE = 100_000_000
N_PAIRS = 200
CONTAIN_TAU = 0.8
DF_MAX = 10

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()

# hashed shingle sets for the planted snippet/host docs only (same
# normalization + 60-bit md5 gram hash as the graded oracle)
con.execute(f"""CREATE TABLE phs AS
  WITH d AS (SELECT * FROM read_parquet('{sf}/documents.parquet')
             WHERE doc_id >= {PLANT_BASE}),
  toks AS (
    SELECT doc_id,
      string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
    FROM d),
  sh AS (
    SELECT doc_id,
      CASE WHEN len(t) >= 3
        THEN list_distinct(list_transform(range(1, len(t)-1),
          i -> t[i]||' '||t[i+1]||' '||t[i+2]))
        ELSE [] END AS s
    FROM toks)
  SELECT doc_id,
    list_distinct(list_transform(s,
      g -> CAST(('0x'||substr(md5('0:'||g),1,15)) AS BIGINT))) AS hs
  FROM sh""")

# exact containment truth for the (4p, 4p+2) quote pairs
con.execute(f"""CREATE TABLE ct AS
  SELECT (a.doc_id - {PLANT_BASE}) // 4 AS p,
    len(list_intersect(a.hs, b.hs))::DOUBLE / least(len(a.hs), len(b.hs)) AS c
  FROM phs a JOIN phs b ON b.doc_id = a.doc_id + 2
  WHERE (a.doc_id - {PLANT_BASE}) % 4 = 0""")
n_true, n_clear = con.execute(
    f"SELECT count(*), sum(CASE WHEN c >= {CONTAIN_TAU} THEN 1 ELSE 0 END) FROM ct").fetchone()
cmin, cmed = con.execute(
    f"SELECT min(c), median(c) FROM ct WHERE c >= {CONTAIN_TAU}").fetchone()
print(f"planted quote pairs: {n_true}, clearing C>={CONTAIN_TAU}: {n_clear} "
      f"(min C {cmin:.3f}, median {cmed:.3f})", flush=True)
assert n_true == N_PAIRS, "generator must have planted all quote pairs"

# corpus-wide df for the planted docs' grams ONLY (semi-join bounds the
# aggregation to ~30k distinct grams; the corpus pass itself is one scan)
con.execute("""CREATE TABLE pgrams AS
  SELECT DISTINCT unnest(hs) AS g FROM phs""")
n_pg, = con.execute("SELECT count(*) FROM pgrams").fetchone()
print(f"distinct planted grams: {n_pg}", flush=True)
con.execute(f"""CREATE TABLE gdf AS
  WITH toks AS (
    SELECT doc_id,
      string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
    FROM read_parquet('{sf}/documents.parquet')),
  sh AS (
    SELECT doc_id,
      CASE WHEN len(t) >= 3
        THEN list_distinct(list_transform(range(1, len(t)-1),
          i -> t[i]||' '||t[i+1]||' '||t[i+2]))
        ELSE [] END AS s
    FROM toks),
  eg AS (
    SELECT doc_id, CAST(('0x'||substr(md5('0:'||g.g),1,15)) AS BIGINT) AS g
    FROM sh, UNNEST(s) AS g(g))
  SELECT eg.g, count(DISTINCT eg.doc_id) AS df
  FROM eg SEMI JOIN pgrams ON eg.g = pgrams.g
  GROUP BY eg.g""")

# reachability: a planted pair is in the lane's declared scope iff the
# snippet and host SHARE >= 1 gram with corpus df <= DF_MAX
con.execute(f"""CREATE TABLE reach AS
  WITH inter AS (
    SELECT (a.doc_id - {PLANT_BASE}) // 4 AS p,
      unnest(list_intersect(a.hs, b.hs)) AS g
    FROM phs a JOIN phs b ON b.doc_id = a.doc_id + 2
    WHERE (a.doc_id - {PLANT_BASE}) % 4 = 0),
  rarecnt AS (
    SELECT p, count(*) AS n_rare
    FROM inter JOIN gdf ON inter.g = gdf.g AND gdf.df <= {DF_MAX}
    GROUP BY p)
  SELECT ct.p, coalesce(rarecnt.n_rare, 0) AS n_rare
  FROM ct LEFT JOIN rarecnt USING (p)""")
n_reach, rare_med = con.execute(
    "SELECT sum(CASE WHEN n_rare > 0 THEN 1 ELSE 0 END), median(n_rare) FROM reach").fetchone()
print(f"rare-gram-reachable pairs: {n_reach}/{N_PAIRS} "
      f"(median rare shared grams {rare_med})", flush=True)

# engine side: which planted quote pairs did the lane emit?
con.execute(f"""CREATE TABLE got AS
  SELECT (doc_a - {PLANT_BASE}) // 4 AS p, containment
  FROM read_parquet('{out}/*.parquet')
  WHERE doc_a >= {PLANT_BASE} AND doc_b = doc_a + 2 AND doc_a % 4 = 0""")

for label, cond in [("full-quote (p even)", "p % 2 = 0"),
                    ("90%-quote (p odd)", "p % 2 = 1"), ("mixed", "TRUE")]:
    den, = con.execute(f"""SELECT count(*) FROM ct JOIN reach USING (p)
      WHERE c >= {CONTAIN_TAU} AND n_rare > 0 AND {cond}""").fetchone()
    num, = con.execute(f"""SELECT count(*) FROM ct JOIN reach USING (p)
      WHERE c >= {CONTAIN_TAU} AND n_rare > 0 AND {cond}
        AND p IN (SELECT p FROM got)""").fetchone()
    print(f"containment recall {label}: {num}/{den} = {num/den:.3f}")

# the lane's guarantee is EXACT recall on the reachable set — hard gate
num_all, den_all = con.execute(f"""SELECT
  sum(CASE WHEN p IN (SELECT p FROM got) THEN 1 ELSE 0 END), count(*)
  FROM ct JOIN reach USING (p)
  WHERE c >= {CONTAIN_TAU} AND n_rare > 0""").fetchone()
assert num_all == den_all, \
    f"rare-gram-reachable recall must be EXACT: {num_all}/{den_all}"

# emitted C must equal truth C (round-6 parity) on the found pairs
bad, = con.execute(f"""SELECT count(*) FROM got JOIN ct USING (p)
  WHERE abs(got.containment - round(ct.c, 6)) > 1e-9""").fetchone()
assert bad == 0, f"{bad} planted pairs disagree on the containment value"
print("ok: reachable recall exact, containment values match truth")
