#!/usr/bin/env python3
"""Fold statistics + closure-recall grade for dedup_hamming_clusters at the
5M-doc sf100 smoke (round 19: the saturation audit's replica-heavy catch —
2.8-3.4M capped rows per combo in the PAIR kernel — gets its graded scale
path; this measures what the fold actually buys on that corpus).

Computes, mirroring the engine's sig pipeline exactly (same md5-token
hashing, same 60-bit majority simhash, same C(6,4) pigeonhole combos):
  1. fold factor: docs -> distinct sigs (the pair kernel's new input size);
  2. midpoint-group occupancy AFTER the fold — the ball join's only skew
     surface, <= 61 rows per group by construction (vs the pre-fold
     dedup_bucket_stats_hamming numbers, where max buckets were ~5000,
     and the retired pigeonhole-over-reps variant's 2302);
  3. closure recall on the planted pairs: of the planted (verbatim, edited)
     pairs whose TRUE sig hamming is <= HAM_K = 2, ALL must land in the
     same cluster in the engine's dumped output (the ball join is exact:
     no cap, no shedding — the assert is a hard gate).

Usage: sf100_hamfold_stats.py <sfDir> <clustersParquetDir>
"""
import sys

import duckdb

HAM_K = 2
SIM_BITS = 60
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

# midpoint-group occupancy over the DISTINCT-sig reps (the ball join's only
# skew surface): a group is the set of distinct sigs within 1 flip of one
# 60-bit point, <= 61 rows by construction — measure the realized max.
# (The retired pigeonhole version of this kernel measured rep buckets up to
# 2302 on this corpus and MAX_BUCKET shed 20/53 qualifying planted pairs.)
row = con.execute(f"""
  WITH sn AS (SELECT sig, min(doc_id) AS rep FROM sg GROUP BY sig),
  mid AS (
    SELECT sig, xor(sig, u.m) AS mid
    FROM sn, UNNEST(list_prepend(0::BIGINT,
      list_transform(range(0, {SIM_BITS}), i -> (1::BIGINT << i)))) AS u(m)),
  g AS (SELECT mid, count(*) AS gsz FROM mid GROUP BY mid)
  SELECT count(*), max(gsz),
    sum(CASE WHEN gsz > 1 THEN gsz * (gsz - 1) // 2 ELSE 0 END)
  FROM g""").fetchone()
print(f"midpoint groups: {row[0]} groups, max group {row[1]} "
      f"(construction bound 61), candidate pairs {row[2]}", flush=True)
assert row[1] <= 1 + SIM_BITS, "midpoint group exceeded the radius-1 ball bound"

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
