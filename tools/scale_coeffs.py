#!/usr/bin/env python3
"""Per-query scale coefficients from two same-session Bench full dumps.

Usage: python3 tools/scale_coeffs.py <bench_sfA.json> <bench_sfB.json> [minSecB]

Prints each query's A->B wall ratio (B/A), sorted descending, with totals.
Queries under minSecB seconds at the larger SF (default 0.5) are pooled into
one "small" line — ratios on sub-noise-floor walls are meaningless.
NOT part of the shipped library — driver-side tooling only.
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
min_b = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
print(f"total: {a['value']:.1f}s ({a['sf']}) -> {b['value']:.1f}s ({b['sf']}) "
      f"= {b['value'] / a['value']:.2f}x over {len(shared)} queries")
rows = []
small_a = small_b = 0.0
n_small = 0
for q in shared:
    if qb[q] < min_b:
        small_a += qa[q]
        small_b += qb[q]
        n_small += 1
    else:
        rows.append((qb[q] / max(qa[q], 0.001), qa[q], qb[q], q))
for r, va, vb, q in sorted(rows, reverse=True):
    print(f"{q:32s} {va:7.2f} -> {vb:7.2f}  {r:5.1f}x")
if n_small:
    print(f"[{n_small} queries under {min_b}s at the larger SF: "
          f"{small_a:.1f}s -> {small_b:.1f}s pooled]")
