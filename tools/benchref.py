#!/usr/bin/env python3
"""Write bench_ref.json: per-query min across N campaign run files.

Usage: python3 tools/benchref.py out.json run1.json [run2.json ...]

The output is the committed per-query reference Bench.scala reads to
print its bounded "over_1p5x_ref" outlier line (so the driver's
tail-truncated BENCH capture can adjudicate slow rows without campaign
forensics). All input runs must share the same "sf" directory; the min
is per query across runs (the campaign's min-of-N convention).
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from benchdelta import load  # noqa: E402 — one parser for Bench output


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out, paths = sys.argv[1], sys.argv[2:]
    runs = [load(p) for p in paths]
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        sys.exit(f"input runs span multiple sf dirs: {sorted(sfs)}")
    mins = {}
    for r in runs:
        for q, v in r["queries"].items():
            mins[q] = min(mins.get(q, float("inf")), float(v))
    doc = {"sf": sfs.pop(), "n_runs": len(runs),
           "queries": {q: round(v, 3) for q, v in sorted(mins.items())}}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(mins)} queries, sf={doc['sf']}")


if __name__ == "__main__":
    main()
