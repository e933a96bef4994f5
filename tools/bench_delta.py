#!/usr/bin/env python3
"""Per-query bench regression diff between two Bench artifacts.

Usage: python3 tools/bench_delta.py OLD.json NEW.json [--threshold 1.5]
                                    [--floor 0.2] [--md BENCH_DELTA.md]

Compares the per-query medians of two bench_out.json-shaped files (the
full-fidelity artifact Bench writes, NOT the driver's truncated stdout
tail). A query is FLAGGED when new/old exceeds --threshold AND the absolute
delta exceeds --floor seconds (sub-noise micro-deltas on a loaded host are
not attributable; see the load_before/load_after columns in the report).
Flagged queries deserve a quiet-machine control re-run:

    SPARK_GRAFT_BENCH_ONLY=q1,q2 SPARK_GRAFT_SF_DIR=... \
        sbt -batch "runMain graft.Bench /tmp/control.json"

Round history lives in tools/bench_history/r<NN>.json (a straight copy of
the round's bench_out.json); BENCH_DELTA.md is the committed per-round diff.
"""
import argparse
import json
import re


def load(path):
    """Accept either Bench's full artifact or the driver's BENCH_r{N}.json
    wrapper (rc/tail/parsed). A tail-only wrapper yields the PARTIAL query
    map recoverable from the preserved stdout suffix — enough for a common-
    subset diff, flagged as partial in the report."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        parsed["partial"] = False
        return parsed
    tail = d.get("tail", "")
    qs = {}
    # the tail cuts mid-line at the front; pairs are "name":float
    for m in re.finditer(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', tail):
        k, v = m.group(1), float(m.group(2))
        if k not in ("value", "load_before", "load_after", "sf"):
            qs[k] = v
    return {"queries": qs, "partial": True,
            "load_before": None, "load_after": None}


def fmt(sec):
    return f"{sec:.2f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.2)
    ap.add_argument("--md", default=None)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    rows = []
    for q in common:
        a, b = oq[q], nq[q]
        if a <= 0 or b <= 0:  # -1 = errored run
            continue
        rows.append((q, a, b, b / a, b - a))

    flagged = [r for r in rows if r[3] > args.threshold and r[4] > args.floor]
    improved = sorted((r for r in rows if r[3] < 1 / args.threshold and -r[4] > args.floor),
                      key=lambda r: r[4])
    flagged.sort(key=lambda r: -r[4])

    ct_old = sum(r[1] for r in rows)
    ct_new = sum(r[2] for r in rows)

    out = []
    out.append(f"# Bench delta: {args.old} -> {args.new}")
    out.append("")
    for label, d in (("old", old), ("new", new)):
        if d.get("partial"):
            out.append(f"- NOTE: {label} side recovered from a truncated "
                       f"driver tail — common subset only")
    out.append(f"- common subset: {len(rows)} queries, "
               f"{fmt(ct_old)} s -> {fmt(ct_new)} s "
               f"({ct_new / ct_old:.2f}x)" if rows else "- no comparable queries")
    out.append(f"- load_before/after: old {old.get('load_before')}/{old.get('load_after')}, "
               f"new {new.get('load_before')}/{new.get('load_after')} "
               f"(this host's bench noise is +-50% under contention)")
    out.append(f"- added: {len(added)} ({', '.join(added[:12])}{'...' if len(added) > 12 else ''})"
               if added else "- added: 0")
    out.append(f"- removed: {len(removed)} ({', '.join(removed)})" if removed else "- removed: 0")
    out.append("")
    if flagged:
        out.append(f"## Flagged regressions (> {args.threshold}x and > {args.floor}s)")
        out.append("")
        out.append("| query | old s | new s | ratio | delta s |")
        out.append("|---|---|---|---|---|")
        for q, a, b, r, d in flagged:
            out.append(f"| {q} | {fmt(a)} | {fmt(b)} | {r:.2f}x | +{fmt(d)} |")
        out.append("")
        out.append("Re-run flagged queries on a quiet machine before treating as real:")
        out.append(f"`SPARK_GRAFT_BENCH_ONLY={','.join(q for q, *_ in flagged)} "
                   f"sbt -batch \"runMain graft.Bench /tmp/control.json\"`")
    else:
        out.append(f"## No regressions above {args.threshold}x / {args.floor}s")
    out.append("")
    if improved:
        out.append("## Largest improvements")
        out.append("")
        out.append("| query | old s | new s | ratio |")
        out.append("|---|---|---|---|")
        for q, a, b, r, d in improved[:10]:
            out.append(f"| {q} | {fmt(a)} | {fmt(b)} | {r:.2f}x |")

    report = "\n".join(out) + "\n"
    print(report)
    if args.md:
        with open(args.md, "w") as f:
            f.write(report)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
