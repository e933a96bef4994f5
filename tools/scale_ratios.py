#!/usr/bin/env python3
"""Two-decade scale table: join three Bench JSON legs (sf0.1, sf1, sf10)
on query name and print a markdown table with per-decade ratios, sorted
by the sf10 time. Usage:

    python3 tools/scale_ratios.py tools/bench_history/r16_scale_sf01.json \
        tools/bench_history/r16_scale_sf1.json \
        tools/bench_history/r16_scale_sf10.json
"""
import json
import sys

legs = [json.load(open(p)) for p in sys.argv[1:4]]
qs = sorted(set(legs[0]["queries"]) & set(legs[1]["queries"]) & set(legs[2]["queries"]),
            key=lambda q: -legs[2]["queries"][q])
print("| query | sf0.1 s | sf1 s | sf10 s | 10x ratio | 100x ratio |")
print("|---|---|---|---|---|---|")
for q in qs:
    a, b, c = (leg["queries"][q] for leg in legs)
    r1 = b / a if a > 0 else float("nan")
    r2 = c / b if b > 0 else float("nan")
    flag = " **(super-linear)**" if r2 > 12 else ""
    print(f"| {q} | {a:.2f} | {b:.2f} | {c:.2f} | {r1:.1f}x | {r2:.1f}x{flag} |")
for i, leg in enumerate(legs):
    print(f"\nleg {i}: load_before={leg['load_before']} load_after={leg['load_after']} "
          f"runs={leg['runs']} errs={leg['n_err']} {leg.get('errors') or ''}")
