#!/usr/bin/env python3
"""Rebuild bench_prior.json from quiet bench_details runs.

Usage: python3 tools/make_bench_prior.py <details.json> [<details.json> ...]

Writes bench_prior.json as {"query": {"median": <ref>}, ...} where <ref>
is the per-query MIN of the medians across the given runs — the quiet
plan-speed reference the cross-run regression sentinel compares against.
Only positive medians participate; a query failed in one run still gets a
reference from the others. Run this EVERY ROUND on the round's quiet
details files (check `uptime`; a run with n_flagged near zero and low
drift_ratio): a stale or loaded prior raises the sentinel's effective
flag bar exactly where it must not (the r14 ndcg_eval escape).
"""
import json
import sys

if len(sys.argv) < 2:
    sys.exit(__doc__)

ref: dict[str, float] = {}
for path in sys.argv[1:]:
    with open(path) as fh:
        details = json.load(fh)
    # Self-rejection (r16 verdict): a details file whose run tripped the
    # drift gate (Bench writes `_meta.noisy_run`) must NEVER refresh the
    # prior — a loaded prior blinds the regression sentinel exactly where
    # it must not. Hard-exit so a scripted refresh cannot half-apply.
    meta = details.pop("_meta", {})
    if meta.get("noisy_run"):
        sys.exit(
            f"REFUSING {path}: _meta.noisy_run=true "
            f"(drift_ratio={meta.get('drift_ratio')}) — a load-contaminated "
            "run cannot refresh bench_prior.json; re-run Bench on a quiet "
            "window (see BenchLogic.NoisyRatio)")
    for name, row in details.items():
        med = row.get("median", -1.0)
        if med and med > 0:
            ref[name] = min(ref.get(name, med), med)

out = {name: {"median": round(ref[name], 6)} for name in sorted(ref)}
with open("bench_prior.json", "w") as fh:
    json.dump(out, fh, indent=0)
print(f"bench_prior.json: {len(out)} entries from {len(sys.argv) - 1} runs")
