#!/usr/bin/env python3
"""Generate /tmp/graft_sf1: a 10x scale-up of sf0.1 for the scale smoke
(BENCH_sf1.md). Replication is STRUCTURE-PRESERVING, not byte-copying:

- documents: replica k>0 rewrites the text by appending a replica-unique
  token after every other word, so replicas are NOT near-duplicates of
  each other (a byte-copy would hand the LSH dedup a 10-clique per doc —
  an adversarial quadratic blowup no organic corpus has; organic growth
  adds mostly-novel documents).
- embeddings: replica k>0 perturbs every dimension by a deterministic
  +-0.05-band offset keyed on (vec_id, k, dim) — new vectors in the same
  distribution, not exact duplicates (cosine-identical copies would
  degenerate the ANN top-k ties).
- events: id/user offsets per replica, ts shifted k microseconds — same
  30-day window at 10x density, disjoint user universes per replica (the
  organic shape for co-occurrence graphs: more users, same per-user rate).
- lineitem/orders: orderkey offsets, same part/customer mix — basket
  structure per order unchanged, 10x more orders.
- small dims (region nation customer supplier part): copied verbatim.

Usage: python3 tools/gen_sf1.py [src] [dst] [replicas]
"""
import os
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# Document rewrite mode:
#   novel   (default) — replica-unique token after every other word. Replicas
#           are near-dup-free but almost every replica gram is NOVEL and
#           rare, which inflates a rare-gram (df-bounded) inverted index far
#           beyond what an organic corpus produces.
#   organic — Zipf-preserving: the inserted token is drawn from a fixed
#           16-word common-filler vocabulary, keyed deterministically on
#           (doc_id, k, position). Replicas still aren't near-dups of each
#           other (filler choice differs per replica at almost every
#           position), but the grams they mint are COMBINATIONS OF SHARED
#           vocabulary, so cross-document gram-sharing — and hence the df
#           distribution the rare-gram filter sees — survives the scale-up.
#
#           The filler key must be HASHED, not a linear form: the original
#           (doc_id*7 + k*13 + i*3) % 16 is periodic in k mod 16, so at
#           R > 16 every replica pair with k1 ≡ k2 (mod 16) drew IDENTICAL
#           fillers at EVERY position — byte-identical texts, i.e. ~1.29M
#           planted J=1 cliques at R=100 (measured: 90% of the sf10
#           dedup_ngram output), exactly the adversarial quadratic this
#           rewrite exists to avoid. hash() breaks the periodicity; any
#           two replicas now agree on ~1/16 of positions only.
mode = sys.argv[4] if len(sys.argv) > 4 else "novel"
assert mode in ("novel", "organic"), f"unknown mode {mode}"

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW ks AS SELECT unnest(range(0,{R})) AS k")


def copy_sql(table, sql):
    con.execute(
        f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


doc = f"read_parquet('{src}/documents.parquet')"
if mode == "novel":
    rewrite = "regexp_replace(d.text, '(\\S+\\s+\\S+)', '\\1 zq' || ks.k, 'g')"
    doc_src = f"{doc} d"
else:
    fillers = ("['the','of','and','to','in','a','is','that',"
               "'for','it','on','as','with','was','at','by']")
    rewrite = f"""array_to_string(flatten([
           CASE WHEN i % 2 = 0 THEN
             [d.w[i], ({fillers})[1 + CAST(hash(d.doc_id*7 + ks.k*13 + i*3) % 16 AS INT)]]
           ELSE [d.w[i]] END
           for i in range(1, len(d.w)+1)]), ' ')"""
    doc_src = f"(SELECT *, string_split(text, ' ') AS w FROM {doc}) d"
copy_sql("documents", f"""
  SELECT d.doc_id + ks.k*(SELECT max(doc_id)+1 FROM {doc}) AS doc_id,
         CASE WHEN ks.k = 0 THEN d.text
              ELSE {rewrite}
         END AS text,
         d.lang, d.source, d.n_chars
  FROM {doc_src} CROSS JOIN ks""")

emb = f"read_parquet('{src}/embeddings.parquet')"
copy_sql("embeddings", f"""
  SELECT e.vec_id + ks.k*(SELECT max(vec_id)+1 FROM {emb}) AS vec_id,
         CASE WHEN ks.k = 0 THEN e.embedding
              ELSE CAST([CAST(e.embedding[i] +
                     0.05*sin(e.vec_id*31.0 + ks.k*17.0 + i) AS FLOAT)
                   for i in range(1, len(e.embedding)+1)] AS FLOAT[])
         END AS embedding,
         e.label
  FROM {emb} e CROSS JOIN ks""")

ev = f"read_parquet('{src}/events.parquet')"
copy_sql("events", f"""
  SELECT e.event_id + ks.k*(SELECT max(event_id)+1 FROM {ev}) AS event_id,
         e.ts + ks.k * INTERVAL 1 MICROSECOND AS ts,
         e.user_id + ks.k*(SELECT max(user_id)+1 FROM {ev}) AS user_id,
         e.event_type, e.value, e.props
  FROM {ev} e CROSS JOIN ks""")

ords = f"read_parquet('{src}/orders.parquet')"
okey = f"(SELECT max(o_orderkey)+1 FROM {ords})"
copy_sql("orders", f"""
  SELECT o.o_orderkey + ks.k*{okey} AS o_orderkey,
         o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
         o.o_orderpriority
  FROM {ords} o CROSS JOIN ks""")

li = f"read_parquet('{src}/lineitem.parquet')"
copy_sql("lineitem", f"""
  SELECT l.l_orderkey + ks.k*{okey} AS l_orderkey,
         l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
         l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
         l.l_linestatus, l.l_shipdate
  FROM {li} l CROSS JOIN ks""")

for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"{t}: copied")

print(f"done -> {dst}")
