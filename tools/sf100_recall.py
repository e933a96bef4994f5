#!/usr/bin/env python3
"""Planted-pair recall grade for the sf100 dedup-family smoke (round-18
verdict item 1, extended to the char lane in round 19): both MinHash
lanes at their third-decade geometries (word: r = 12, b = 8; char:
r = 13, b = 6 at 5M docs) must still FIND the planted near-dup pairs —
the sf10 hamming lesson is that runtime gates cannot see recall loss.

Ground truth first: each planted pair's exact Jaccard (word-3-shingles
AND char-6-grams, with the SAME normalization the graded oracles use)
is computed, and only pairs clearing each lane's graded threshold
(0.5 word, 0.6 char) count toward that lane's denominator.

Usage: sf100_recall.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb

PLANT_BASE = 100_000_000
N_PAIRS = 200

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()

# exact truth for the 400 planted docs only (tiny)
con.execute(f"""CREATE TABLE ps AS
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
  SELECT (a.doc_id - {PLANT_BASE}) // 4 AS p,
    len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS j
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
  WHERE (a.doc_id - {PLANT_BASE}) % 4 = 0""")
n_true, n_clear = con.execute(
    "SELECT count(*), sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) FROM ps").fetchone()
jmin, jmed = con.execute(
    "SELECT min(j), median(j) FROM ps WHERE j >= 0.5").fetchone()
print(f"planted pairs: {n_true}, clearing J>=0.5: {n_clear} "
      f"(min J {jmin:.3f}, median {jmed:.3f})")
assert n_true == N_PAIRS, "generator must have planted all pairs"

# char-6-gram truth for the same planted docs (the graded char oracle's
# normalization: lower/trim/ws-collapse, then all 6-char substrings)
con.execute(f"""CREATE TABLE cs AS
  WITH d AS (SELECT * FROM read_parquet('{sf}/documents.parquet')
             WHERE doc_id >= {PLANT_BASE}),
  nrm AS (
    SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
    FROM d),
  sh AS (
    SELECT doc_id,
      CASE WHEN len(nt) >= 6
        THEN list_distinct(list_transform(range(1, len(nt)-4), i -> substr(nt, i, 6)))
        ELSE [] END AS s
    FROM nrm)
  SELECT (a.doc_id - {PLANT_BASE}) // 4 AS p,
    len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS j
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
  WHERE (a.doc_id - {PLANT_BASE}) % 4 = 0""")
cjmin, cjmed = con.execute(
    "SELECT min(j), median(j) FROM cs WHERE j >= 0.6").fetchone()
n_cclear, = con.execute(
    "SELECT count(*) FROM cs WHERE j >= 0.6").fetchone()
print(f"char-lane truth: clearing J>=0.6: {n_cclear} "
      f"(min J {cjmin:.3f}, median {cjmed:.3f})")

for lane, table, truth, tau in [
        ("word", "dedup_lsh_pairs", "ps", 0.5),
        ("char", "dedup_ngram", "cs", 0.6)]:
    con.execute(f"""CREATE OR REPLACE TABLE got AS
      SELECT (doc_a - {PLANT_BASE}) // 4 AS p
      FROM read_parquet('{out}/{table}/*.parquet')
      WHERE doc_a >= {PLANT_BASE} AND doc_b = doc_a + 1 AND doc_a % 4 = 0""")
    for label, cond in [("1-edit (p even)", "p % 2 = 0"),
                        ("2-edit (p odd)", "p % 2 = 1"), ("mixed", "TRUE")]:
        den, = con.execute(
            f"SELECT count(*) FROM {truth} WHERE j >= {tau} AND {cond}").fetchone()
        num, = con.execute(f"""SELECT count(*) FROM {truth}
          WHERE j >= {tau} AND {cond} AND p IN (SELECT p FROM got)""").fetchone()
        print(f"{lane} recall {label}: {num}/{den} = {num/den:.3f}")

print("\nbucket stats (capped_rows > 0 = MAX_BUCKET shed candidate rows):")
for lane in ["dedup_bucket_stats", "dedup_bucket_stats_ngram",
             "dedup_bucket_stats_hamming"]:
    try:
        rows = con.execute(f"""SELECT * FROM
            read_parquet('{out}/{lane}/*.parquet') ORDER BY band""").fetchall()
        print(f" {lane}:")
        for row in rows:
            print("  ", row)
    except Exception as e:
        print(f" {lane}: (not in this verify run: {e})")
