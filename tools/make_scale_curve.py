#!/usr/bin/env python3
"""Compose BENCH_SCALE_r{N}.json from per-scale graft.Bench outputs.

Usage: make_scale_curve.py <out.json> <round> <sf=benchfile> [sf=benchfile ...]

Each benchfile is a graft.Bench bench_out.json (full-name keys). Scales are
ordered as given; step ratios are computed between consecutive scales for
queries present in both, labeled step_ratio_<a>_<b>. A 10x data step at
linear scaling would show ratio 10.0; ratios are per-query MIN-time based
(the Bench discipline), so box noise reads low, not high.
"""
import json
import sys


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    out_path, rnd = sys.argv[1], sys.argv[2]
    points = []
    for spec in sys.argv[3:]:
        sf, path = spec.split("=", 1)
        with open(path) as f:
            d = json.load(f)
        points.append((sf, d))
    queries = {}
    for sf, d in points:
        for q, t in d["queries"].items():
            if t >= 0:
                queries.setdefault(q, {})[sf] = t
    for q, row in queries.items():
        for (sfa, _), (sfb, _) in zip(points, points[1:]):
            if sfa in row and sfb in row and row[sfa] > 0:
                row[f"step_ratio_{sfa}_{sfb}"] = round(row[sfb] / row[sfa], 2)
    doc = {
        "metric": f"cross_scale_bench_{rnd}",
        "note": ("Self-measured scale curve; per-query MIN across 2 suite "
                 "passes x 2 timed runs (the Bench discipline), all points "
                 "sequential on the same box, never concurrent JVMs. "
                 "Subset points list only the queries they ran."),
        "suite_totals_sec": {sf: round(d.get("value", 0), 3)
                             for sf, d in points},
        "queries": dict(sorted(queries.items())),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path}: {len(queries)} queries over "
          f"{[sf for sf, _ in points]}")


if __name__ == "__main__":
    sys.exit(main())
