#!/usr/bin/env python3
"""Planted-pair recall grade for the hyperplane-LSH multiprobe lane at its
third decade (round 19: T(P) compensation — tablesFor — engages at P = 13;
this grades the lane at P = 17, T = 6 on 5M vectors, where the historical
fixed T = 3 would have decayed recall geometrically).

Ground truth: each planted pair's EXACT cosine is recomputed from the
corpus; per-pair theory p_i = 1 − (1 − r_i)^T with r_i = (1 − θ_i/π)^P is
the Goemans–Williamson collision rate — measured recall is compared to the
theory MEAN for the shipped T and for the retired fixed T = 3, so the
compensation's value is a measured-vs-theory statement, not an argument.

Usage: sf100_vec_recall.py <sfDir> <multiprobeParquetDir> <P> <T>
"""
import math
import sys

import duckdb

PLANT_BASE = 100_000_000

sf, out, P, T = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
con = duckdb.connect()

truth = con.execute(f"""
  SELECT a.vec_id,
    list_dot_product(a.embedding, b.embedding) /
      (sqrt(list_dot_product(a.embedding, a.embedding)) *
       sqrt(list_dot_product(b.embedding, b.embedding))) AS c
  FROM read_parquet('{sf}/embeddings.parquet') a
  JOIN read_parquet('{sf}/embeddings.parquet') b
    ON b.vec_id = a.vec_id + 1 AND a.vec_id >= {PLANT_BASE}
   AND (a.vec_id - {PLANT_BASE}) % 4 = 0
  ORDER BY a.vec_id""").fetchall()
# the lane verifies cos >= 0.15; every planted pair clears it by construction
qual = [(v, c) for v, c in truth if c >= 0.15]
print(f"planted pairs: {len(truth)} graded, {len(qual)} above the lane threshold; "
      f"cosine min {min(c for _, c in truth):.4f} "
      f"median {sorted(c for _, c in truth)[len(truth)//2]:.4f}")

found = con.execute(f"""
  SELECT count(*) FROM read_parquet('{out}/*.parquet')
  WHERE vec_a >= {PLANT_BASE} AND vec_b = vec_a + 1
    AND (vec_a - {PLANT_BASE}) % 4 = 0""").fetchone()[0]

def theory(t):
    ps = [1 - (1 - (1 - math.acos(min(c, 1.0)) / math.pi) ** P) ** t
          for _, c in qual]
    return sum(ps) / len(ps)

measured = found / len(qual)
print(f"measured recall at P={P} T={T}: {found}/{len(qual)} = {measured:.3f}")
print(f"theory mean at T={T}: {theory(T):.3f}; at the retired fixed T=3: {theory(3):.3f}")
assert measured >= theory(T) - 0.1, \
    "measured recall must sit within noise of the compensated theory rate"
print("OK")
