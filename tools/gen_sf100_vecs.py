#!/usr/bin/env python3
"""Embeddings-only third-decade corpus for the hyperplane-LSH smoke
(round 19: the multiprobe lane gets recall-compensated T(P); this corpus
grades it where the compensation actually engages — P = 17, T = 6 at 5M
vectors vs the historical fixed T = 3).

Organic growth = mostly-NOVEL vectors (hash-keyed uniform components),
NOT perturbation replicas: gen_sf1.py's ±0.05-perturbation replicas are
mutually cos ≈ 0.99, so at R = 2500 the true near-dup pair set is
Ω(R²·bases) ≈ 6×10⁹ — output-quadratic by construction, the adversarial
shape its own doc note warns about. An organic embedding corpus grows by
new points in the same distribution.

Planted pairs (ids from PLANT_BASE): N_PAIRS base vectors re-emitted
verbatim at PLANT_BASE+4p and with a small deterministic perturbation at
PLANT_BASE+4p+1 (target cosine ~0.95, the compensation design point; the
grader recomputes each pair's EXACT cosine and grades against per-pair
theory, so the target only centers the distribution).

Usage: gen_sf100_vecs.py [src_sf0.1] [dst] [replicas]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100_vecs"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 2500
DIM = 64
N_PAIRS = 200
PLANT_BASE = 100_000_000

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# organic: replica 0 = the source vectors verbatim; replica k>0 = novel
# vectors with hash-uniform components in [-0.5, 0.5) (same support as the
# source distribution), labels cycled over the source label set
n0 = con.execute(
    f"SELECT count(*), max(vec_id) FROM read_parquet('{src}/embeddings.parquet')"
).fetchone()
print(f"src: {n0[0]} vectors, max id {n0[1]}", flush=True)
con.execute(f"""CREATE TABLE organic AS
  SELECT e.vec_id + ks.k * {n0[1] + 1} AS vec_id,
    CASE WHEN ks.k = 0 THEN e.embedding
    ELSE list_transform(range(0, {DIM}), i -> CAST(
      (hash(e.vec_id * 131 + ks.k * 7919 + i) % 1000000) / 1000000.0 - 0.5 AS FLOAT))
    END AS embedding,
    e.label
  FROM read_parquet('{src}/embeddings.parquet') e
  CROSS JOIN (SELECT unnest(range(0, {R})) AS k) ks""")
n = con.execute("SELECT count(*), max(vec_id) FROM organic").fetchone()
print(f"organic: {n[0]} vectors, max id {n[1]}", flush=True)
assert n[1] < PLANT_BASE

# planted: every (n//N_PAIRS)-th organic vector re-emitted (verbatim,
# perturbed). Perturbation: add eps*u with u hash-uniform in [-0.5,0.5)^DIM;
# for unit-ish vectors eps=0.18 centers cosine ~0.95.
con.execute(f"""CREATE TABLE bases AS
  SELECT vec_id, embedding, label,
    row_number() OVER (ORDER BY vec_id) - 1 AS p
  FROM (SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM organic)
  WHERE rn % ({n[0]} // {N_PAIRS}) = 1
  ORDER BY vec_id LIMIT {N_PAIRS}""")
con.execute(f"""CREATE TABLE planted AS
  SELECT {PLANT_BASE} + 4*p AS vec_id, embedding, label FROM bases
  UNION ALL
  SELECT {PLANT_BASE} + 4*p + 1 AS vec_id,
    list_transform(range(1, {DIM} + 1), i -> CAST(embedding[i] +
      0.18 * ((hash(p * 37 + i) % 1000000) / 1000000.0 - 0.5) AS FLOAT)) AS embedding,
    label
  FROM bases""")
print("planted:", con.execute("SELECT count(*) FROM planted").fetchone()[0], flush=True)

con.execute(f"""COPY (
  SELECT * FROM organic UNION ALL SELECT * FROM planted ORDER BY vec_id
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
total = con.execute(
    f"SELECT count(*) FROM read_parquet('{dst}/embeddings.parquet')").fetchone()[0]
print(f"embeddings: {total} vectors -> {dst}/embeddings.parquet", flush=True)

# planted-pair exact cosines (the grader's ground truth lives in the data)
rows = con.execute(f"""
  SELECT min(c), approx_quantile(c, 0.5), max(c) FROM (
    SELECT list_dot_product(a.embedding, b.embedding) /
      (sqrt(list_dot_product(a.embedding, a.embedding)) *
       sqrt(list_dot_product(b.embedding, b.embedding))) AS c
    FROM read_parquet('{dst}/embeddings.parquet') a
    JOIN read_parquet('{dst}/embeddings.parquet') b
      ON b.vec_id = a.vec_id + 1 AND a.vec_id >= {PLANT_BASE}
     AND (a.vec_id - {PLANT_BASE}) % 4 = 0)""").fetchone()
print(f"planted cosine: min {rows[0]:.4f} median {rows[1]:.4f} max {rows[2]:.4f}",
      flush=True)
