#!/usr/bin/env python3
"""Fold statistics + closure-recall grade for dedup_hamming_clusters at the
5M-doc sf100 smoke (round 19: the saturation audit's replica-heavy catch —
2.8-3.4M capped rows per combo in the PAIR kernel — gets its graded scale
path; this measures what the fold actually buys on that corpus).

Computes, mirroring the engine's sig pipeline exactly (same md5-token
hashing, same 60-bit majority simhash, same C(6,4) pigeonhole combos):
  1. fold factor: docs -> distinct sigs (the pair kernel's new input size);
  2. rep-bucket occupancy per combo AFTER the fold (vs the pre-fold
     dedup_bucket_stats_hamming numbers, where max buckets were ~5000);
  3. closure recall on the planted pairs: of the planted (verbatim, edited)
     pairs whose TRUE sig hamming is <= HAM_K = 2, how many land in the
     same cluster in the engine's dumped output (exact recall expected:
     the pigeonhole guarantee is deterministic once buckets don't cap).

Usage: sf100_hamfold_stats.py <sfDir> <clustersParquetDir>
"""
import sys

import duckdb

HAM_K = 2
SIM_BITS = 60
SIM_BANDS = 6
MAX_BUCKET = 64
PLANT_BASE = 100_000_000

sf, out = sys.argv[1], sys.argv[2]
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

n_docs, n_sigs = con.execute(
    "SELECT count(*), count(DISTINCT sig) FROM sg").fetchone()
print(f"fold: {n_docs} docs -> {n_sigs} distinct sigs "
      f"({n_docs / max(n_sigs, 1):.1f}x)", flush=True)

# post-fold occupancy per combo over the DISTINCT-sig reps (what the cluster
# lane's MAX_BUCKET guard actually sees)
r = SIM_BITS // SIM_BANDS
import itertools
arms = []
for ci, c in enumerate(itertools.combinations(range(SIM_BANDS), SIM_BANDS - HAM_K)):
    key = " | ".join(f"(((sig >> {b * r}) & {(1 << r) - 1}) << {j * r})"
                     for j, b in enumerate(c))
    arms.append(f"SELECT {ci} AS combo, ({key}) AS key FROM sn")
print("post-fold rep-bucket occupancy per combo:")
for row in con.execute(f"""
  WITH sn AS (SELECT sig, min(doc_id) AS rep FROM sg GROUP BY sig),
  b0 AS ({' UNION ALL '.join(arms)}),
  b AS (SELECT combo, key, count(*) AS bsz FROM b0 GROUP BY combo, key)
  SELECT combo, max(bsz) AS max_bucket,
    sum(CASE WHEN bsz > {MAX_BUCKET} THEN 1 ELSE 0 END) AS capped_buckets,
    sum(CASE WHEN bsz > {MAX_BUCKET} THEN bsz ELSE 0 END) AS capped_rows
  FROM b GROUP BY combo ORDER BY combo""").fetchall():
    print(f"  combo {row[0]:2d}: max_bucket {row[1]}, "
          f"capped_buckets {row[2]}, capped_rows {row[3]}", flush=True)

# planted closure recall: pairs (4p, 4p+1) with TRUE sig hamming <= K must
# share a cluster in the engine output
truth = con.execute(f"""
  SELECT a.doc_id, b.doc_id, bit_count(xor(a.sig, b.sig)) AS h
  FROM sg a JOIN sg b
    ON a.doc_id >= {PLANT_BASE} AND b.doc_id = a.doc_id + 1
   AND (a.doc_id - {PLANT_BASE}) % 4 = 0
  ORDER BY a.doc_id""").fetchall()
qual = [(a, b) for a, b, h in truth if h <= HAM_K]
print(f"planted pairs: {len(truth)} graded, {len(qual)} within hamming {HAM_K} "
      f"(hamming histogram: {sorted(set((h, sum(1 for _,_,x in truth if x==h)) for _,_,h in truth))})")
con.execute(f"""CREATE TABLE cl AS
  SELECT doc_id, cluster FROM read_parquet('{out}/*.parquet')
  WHERE doc_id >= {PLANT_BASE}""")
found = con.execute(f"""
  SELECT count(*) FROM
    (SELECT a.doc_id FROM cl a JOIN cl b ON b.doc_id = a.doc_id + 1
     AND (a.doc_id - {PLANT_BASE}) % 4 = 0 AND a.cluster = b.cluster)""").fetchone()[0]
# count only the qualifying subset
found_q = con.execute(f"""
  SELECT count(*) FROM (VALUES {', '.join(f'({a})' for a, b in qual)}) v(d)
  JOIN cl a ON a.doc_id = v.d JOIN cl b ON b.doc_id = v.d + 1
  WHERE a.cluster = b.cluster""").fetchone()[0] if qual else 0
print(f"closure recall on qualifying planted pairs: {found_q}/{len(qual)}"
      f" (same-cluster pairs among all planted: {found})")
assert found_q == len(qual), \
    "pigeonhole closure must find EVERY planted pair within the radius"
print("OK", flush=True)
