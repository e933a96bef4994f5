#!/usr/bin/env python3
"""Documents-only sf100 corpus for the dedup-family third-decade smoke
(VERDICT r17 next-round #1): the gen_sf1.py organic rewrite at R=1000
(~5.4M docs), plus PLANTED near-duplicate pairs for output-level recall
measurement — the sf10 hamming lesson says runtime gates can't see
recall loss, so the third-decade claim must be graded on planted truth.

Planted pairs (ids from PLANT_BASE, far above the organic id space):
  - N_PAIRS base docs sampled evenly from the organic corpus;
  - each base doc re-emitted three times: verbatim at PLANT_BASE+4p; with
    1 edit (p even) or 2 edits (p odd) at PLANT_BASE+4p+1 — word-level
    replacements at fixed positions, J(word-3-shingle) ~ 0.9 / ~0.8,
    both clearing the word lane's graded 0.5 threshold by construction
    (re-verified exactly by the smoke before recall is scored); and as a
    containment HOST at PLANT_BASE+4p+2 (round-20: the quoted-snippet
    family dedup_containment exists for — low Jaccard, high containment;
    graded by sf100_contain_recall.py).

Usage: python3 tools/gen_sf100_docs.py [src_sf0.1] [dst] [replicas]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100_docs"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
N_PAIRS = 200
PLANT_BASE = 100_000_000

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW ks AS SELECT unnest(range(0,{R})) AS k")

doc = f"read_parquet('{src}/documents.parquet')"
fillers = ("['the','of','and','to','in','a','is','that',"
           "'for','it','on','as','with','was','at','by']")
rewrite = f"""array_to_string(flatten([
       CASE WHEN i % 2 = 0 THEN
         [d.w[i], ({fillers})[1 + CAST(hash(d.doc_id*7 + ks.k*13 + i*3) % 16 AS INT)]]
       ELSE [d.w[i]] END
       for i in range(1, len(d.w)+1)]), ' ')"""
doc_src = f"(SELECT *, string_split(text, ' ') AS w FROM {doc}) d"

con.execute(f"""CREATE TABLE organic AS
  SELECT d.doc_id + ks.k*(SELECT max(doc_id)+1 FROM {doc}) AS doc_id,
         CASE WHEN ks.k = 0 THEN d.text ELSE {rewrite} END AS text,
         d.lang, d.source, d.n_chars
  FROM {doc_src} CROSS JOIN ks""")
n = con.execute("SELECT count(*), max(doc_id) FROM organic").fetchone()
print(f"organic: {n[0]} rows, max id {n[1]}", flush=True)
assert n[1] < PLANT_BASE, "planted id base must clear the organic id space"

# planted near-dup pairs: sample every (n // N_PAIRS)-th K=0 ORIGINAL doc
# with >= 40 words (so 1-2 edits keep J high), emit (verbatim, edited,
# host) copies. k=0 only (round-20): a k>0 rewrite's every trigram
# contains a filler, and with 16 filler choices x 1000 replicas x a small
# source vocab those grams measure df ~ 9000 in the full corpus — so a
# host quoting a REWRITE is invisible to the containment lane's rare-gram
# index (df <= DF_MAX = 10) by the lane's own declared semantics, and the
# containment family's denominator collapses (measured: 1/200 reachable).
# Originals' grams measure median df ~ 11 with ~19 rare grams per doc —
# reachable. The word/char/hamming families are indifferent to the base
# choice: their recall is a function of J(4p, 4p+1) alone, which the
# edit construction fixes regardless of which doc is copied.
con.execute(f"""CREATE TABLE bases AS
  SELECT doc_id, text, lang, source, n_chars,
         row_number() OVER (ORDER BY doc_id) - 1 AS p
  FROM (SELECT *, row_number() OVER (ORDER BY doc_id) AS rn
        FROM organic
        WHERE doc_id <= (SELECT max(doc_id) FROM {doc})
          AND len(string_split(text, ' ')) >= 40)
  WHERE rn % ((SELECT count(*) FROM organic
               WHERE doc_id <= (SELECT max(doc_id) FROM {doc})
                 AND len(string_split(text, ' ')) >= 40) // {N_PAIRS}) = 1
  ORDER BY doc_id LIMIT {N_PAIRS}""")
con.execute(f"""CREATE TABLE planted AS
  WITH w AS (SELECT *, string_split(text, ' ') AS toks FROM bases)
  SELECT {PLANT_BASE} + 4*p AS doc_id, text, lang, source, n_chars FROM w
  UNION ALL
  SELECT {PLANT_BASE} + 4*p + 1 AS doc_id,
    array_to_string([
      CASE WHEN i = 8 THEN 'plantedtokenq'
           WHEN i = 25 AND p % 2 = 1 THEN 'plantedtokenz'
           ELSE toks[i] END
      for i in range(1, len(toks)+1)], ' ') AS text,
    lang, source, n_chars
  FROM w
  UNION ALL
  -- containment family (round-20): a HOST doc at 4p+2 embedding the base
  -- verbatim (p even) or its first 90% of words (p odd) between per-pair
  -- UNIQUE filler prose (30 words each side, 'hostw{{p}}{{i}}' — df 1, so
  -- the host adds no shared grams beyond the quoted snippet itself).
  -- Jaccard(snippet, host) ~ |snippet|/|host| ~ 0.4 — BELOW both minhash
  -- lanes' thresholds by construction; containment C = |A n B|/min =
  -- 1.0 (p even) / ~0.9 (p odd), both clearing CONTAIN_TAU = 0.8. The
  -- snippet's grams appear in: the organic original, the verbatim plant
  -- 4p, most of the edited plant 4p+1, and this host — df <= 5 <= DF_MAX,
  -- so every pair (4p, 4p+2) is rare-gram-reachable and the lane's
  -- EXACT-recall-for-reachable-pairs guarantee applies.
  SELECT {PLANT_BASE} + 4*p + 2 AS doc_id,
    array_to_string(
      [ 'hostw' || p || 'a' || i for i in range(0, 30) ] ||
      toks[1 : CASE WHEN p % 2 = 0 THEN len(toks)
                    ELSE (9 * len(toks)) // 10 END] ||
      [ 'hostw' || p || 'b' || i for i in range(0, 30) ], ' ') AS text,
    lang, source, n_chars
  FROM w""")
print("planted:", con.execute("SELECT count(*) FROM planted").fetchone()[0], flush=True)

con.execute(f"""COPY (
  SELECT * FROM organic UNION ALL SELECT * FROM planted ORDER BY doc_id
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
total = con.execute(
    f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()[0]
print(f"documents: {total} rows -> {dst}/documents.parquet", flush=True)
