#!/usr/bin/env python3
"""Local oracle-parity harness mirroring the driver's t2 gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet tables, and
compares: column names (sorted), row count, and full sorted-rowset equality.
"""
import sys, os, json, math
import duckdb

BIG = 200_000
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir, json_out=None, only=None):
    results = {}

    def flush():
        if json_out:
            with open(json_out + ".tmp", "w") as f:
                json.dump({"sf_dir": sf_dir, "ok": n_ok, "fail": n_bad,
                           "queries": results}, f, indent=1, sort_keys=True)
            os.replace(json_out + ".tmp", json_out)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only is not None and name not in only:
            continue
        flush()
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        scols = sorted(spark_rel.columns)
        n_s = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        if name not in oracles:
            print(f"  [rows-only] {name}: {n_s} rows")
            results[name] = {"status": "rows-only", "rows": n_s}
            continue
        try:
            # materialize the oracle ONCE; big results then compare
            # set-wise inside DuckDB instead of as python tuples
            con.execute(f"CREATE OR REPLACE TEMP TABLE __oracle AS {oracles[name]}")
            orel = con.sql("SELECT * FROM __oracle")
            ocols = sorted(orel.columns)
            n_o = con.execute("SELECT count(*) FROM __oracle").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            results[name] = {"status": "fail", "err": str(e)[:500]}
            n_bad += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            results[name] = {"status": "fail",
                             "err": f"columns spark={scols} oracle={ocols}"}
            n_bad += 1
            continue
        # Dtype parity: the driver's hash path materializes via pandas, where
        # e.g. a DuckDB HUGEINT (windowed sum of BIGINT) becomes float64 and
        # hash-mismatches Spark's int64 even though Python int comparison
        # passes (the round-8 pack_sequences escape). Compare numeric families
        # per column so that divergence fails HERE, not at the driver.
        stypes = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
        otypes = dict(zip(orel.columns, (str(t) for t in orel.types)))
        fam_bad = [(c, stypes[c], otypes[c]) for c in scols
                   if family(stypes[c]) != family(otypes[c])]
        if fam_bad:
            print(f"FAIL {name}: dtype divergence (spark vs oracle): {fam_bad}")
            results[name] = {"status": "fail", "err": f"dtype divergence: {fam_bad}"}
            n_bad += 1
            continue
        cols = ', '.join(q(c) for c in scols)
        sq = f"SELECT {cols} FROM read_parquet('{d}/*.parquet')"
        oq = f"SELECT {cols} FROM __oracle"
        if max(n_s, n_o) > BIG:
            # bag-compare in the engine: duplicates respected (EXCEPT ALL),
            # NaN equal under DuckDB's total order — the same verdict the
            # python path reaches, without materializing 10^7 tuples
            d1 = con.execute(f"SELECT count(*) FROM (({sq}) EXCEPT ALL ({oq}))").fetchone()[0]
            d2 = con.execute(f"SELECT count(*) FROM (({oq}) EXCEPT ALL ({sq}))").fetchone()[0]
            if n_s == n_o and d1 == 0 and d2 == 0:
                print(f"ok   {name}: {n_s} rows (engine-side compare)")
                results[name] = {"status": "ok", "rows": n_s}
                n_ok += 1
            else:
                n_bad += 1
                print(f"FAIL {name}: spark {n_s} rows vs oracle {n_o} rows "
                      f"(spark-only {d1}, oracle-only {d2})")
                results[name] = {"status": "fail",
                                 "err": f"rowset mismatch: spark {n_s} vs oracle {n_o} "
                                        f"(spark-only {d1}, oracle-only {d2})"}
            continue
        srows = con.execute(sq).fetchall()
        orows = con.execute(oq).fetchall()
        a = sorted([tuple(norm(v) for v in r) for r in srows], key=repr)
        b = sorted([tuple(norm(v) for v in r) for r in orows], key=repr)
        if a == b:
            print(f"ok   {name}: {len(a)} rows")
            results[name] = {"status": "ok", "rows": len(a)}
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: spark {len(a)} rows vs oracle {len(b)} rows")
            # list-membership (not set) so rows holding unhashable values
            # (arrays/structs) can't make the failure report itself throw
            diff_a = [r for r in a if r not in b][:3]
            diff_b = [r for r in b if r not in a][:3]
            print(f"     spark-only: {diff_a}")
            print(f"     oracle-only: {diff_b}")
            results[name] = {"status": "fail",
                             "err": f"rowset mismatch: spark {len(a)} vs oracle {len(b)} rows",
                             "spark_only": [repr(r) for r in diff_a],
                             "oracle_only": [repr(r) for r in diff_b]}
    flush()
    print(f"== {n_ok} ok, {n_bad} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "ok": n_ok, "fail": n_bad,
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_bad else 0


def q(c):
    return '"' + c.replace('"', '""') + '"'


def family(t):
    """Collapse a DuckDB type name to the family that matters for the
    driver's pandas-materialized hash: int widths are interchangeable, but
    HUGEINT and DECIMAL materialize as float64/object and must be flagged
    against an int/float counterpart."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t == "HUGEINT":
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    return t


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None))
