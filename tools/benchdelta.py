#!/usr/bin/env python3
"""Compare two full Bench run JSONs, raw and calibration-normalized.

usage: benchdelta.py baseline_run.json candidate_run.json [--top N]

Prints per-query candidate/baseline ratios alongside the two runs'
host calibration probes (calib_cpu_sec / calib_shuffle_sec, emitted by
Bench since round 13). The calib-normalized ratio divides each query's
raw ratio by the runs' shuffle-calib ratio — the regime the zero-steal
bandwidth-contention weather mode hits (see BASELINE.md) — so a row
elevated raw but ~1.0 normalized is weather, while a row elevated in
BOTH columns is a code regression candidate. Runs without calib fields
(pre-round-13) get raw ratios only, with a note.

Exit code is 0 always: this is an adjudication aid, not a gate —
tools/gates.sh and the correctness sweep are the gates.
"""
import json
import sys


def load(path):
    with open(path) as f:
        lines = f.read().splitlines()
    # Bench emits up to three JSON lines (per-query, compact total,
    # slowest); files may also carry log prefixes/suffixes. Scan line by
    # line with raw_decode and keep the first object carrying "queries".
    dec = json.JSONDecoder()
    for line in lines:
        i = line.find("{")
        if i < 0:
            continue
        try:
            d, _ = dec.raw_decode(line[i:])
        except ValueError:
            continue
        if isinstance(d, dict) and "queries" in d:
            return d
    sys.exit(f"{path}: no per-query record found (need the Bench line "
             "that carries \"queries\")")


def main():
    argv = sys.argv[1:]
    top = 0
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        sys.exit(__doc__.strip().splitlines()[2])
    base, cand = load(args[0]), load(args[1])
    bq, cq = base["queries"], cand["queries"]
    shared = sorted(set(bq) & set(cq))
    only_b, only_c = set(bq) - set(cq), set(cq) - set(bq)
    if only_b or only_c:
        print(f"note: {len(only_b)} queries only in baseline, "
              f"{len(only_c)} only in candidate — compared on "
              f"{len(shared)} shared")

    bh, ch = base.get("host", {}), cand.get("host", {})
    calib_ratio = None
    for k in ("calib_cpu_sec", "calib_shuffle_sec"):
        bv, cv = bh.get(k), ch.get(k)
        if bv and cv:
            print(f"{k}: baseline {bv:.2f}  candidate {cv:.2f}  "
                  f"ratio {cv / bv:.2f}")
            if k == "calib_shuffle_sec":
                calib_ratio = cv / bv
        else:
            print(f"{k}: missing in one run — raw ratios only")
    for k in ("steal_pct", "load1_before", "load1_after"):
        print(f"{k}: baseline {bh.get(k)}  candidate {ch.get(k)}")

    bt = sum(bq[q] for q in shared)
    ct = sum(cq[q] for q in shared)
    print(f"\ntotal (shared queries): baseline {bt:.1f} s  "
          f"candidate {ct:.1f} s  ratio {ct / bt:.2f}"
          + (f"  calib-normalized {ct / bt / calib_ratio:.2f}"
             if calib_ratio else ""))

    rows = sorted(shared, key=lambda q: -(cq[q] / bq[q] if bq[q] else 0))
    if top:
        rows = rows[:top]
    hdr = f"{'query':28s} {'base_s':>7s} {'cand_s':>7s} {'ratio':>6s}"
    if calib_ratio:
        hdr += f" {'norm':>6s}"
    print("\n" + hdr)
    for q in rows:
        r = cq[q] / bq[q] if bq[q] else float("inf")
        line = f"{q:28s} {bq[q]:7.2f} {cq[q]:7.2f} {r:6.2f}"
        if calib_ratio:
            line += f" {r / calib_ratio:6.2f}"
        print(line)


if __name__ == "__main__":
    main()
