#!/usr/bin/env python3
"""Bench-to-bench regression compare over two Bench JSON artifacts.

Usage: compare_bench.py <oldBench.json> <newBench.json> [ratio]

Reads two `graft.Bench` output files (bench_out.json / BENCH_r{N}.json
shape: {"value": total, "failed": [...], "queries": {name: sec}}),
compares the queries common to both, and reports:
  - suite totals (all queries and common-subset-only, so a grown
    inventory can't masquerade as a regression);
  - every common query whose time ratio new/old exceeds the threshold
    (default 1.5 — the envelope BASELINE.md uses), slowest first;
  - queries added, removed, or newly failed.
Exit 0 iff nothing newly failed and no common query regressed past the
threshold. Box noise routinely moves single queries ~1.3x either way
(BASELINE.md's drift envelope); a flagged ratio is a prompt to re-run
and explain, not automatically a plan regression.
"""
import json
import re
import sys


def load(path):
    """Accept either Bench's own line (bench_out.json) or the driver's
    BENCH_r{N}.json wrapper ({"tail": stdout, "parsed": line-or-null})."""
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d or not d.get("queries"):
        if isinstance(d.get("parsed"), dict) and d["parsed"].get("queries"):
            d = d["parsed"]
        elif isinstance(d.get("parsed"), dict):
            # r11+ summary-line protocol: the final stdout line carries
            # totals/failed only; per-query timings live on the preceding
            # queries_chunk lines (partially visible in the tail) and in
            # full in bench_out.json. Merge what the tail shows.
            parsed = dict(d["parsed"])
            qs = dict((k, float(v)) for k, v in re.findall(
                r'"(q[0-9]+[a-z]*(?:_[a-z0-9_]+)?)":\s*(-?[0-9.]+)',
                d.get("tail", "")))
            qs.pop("queries_chunk", None)
            if qs:
                print(f"note: {path} summary line has no queries; "
                      f"recovered {len(qs)} entries from the tail "
                      f"(full map in bench_out.json)")
            parsed["queries"] = qs
            d = parsed
        elif "tail" in d:  # parsed=null: recover from the (possibly
            # head-truncated — the 2000-char capture window) stdout tail
            start = d["tail"].rfind('{"metric"')
            parsed = None
            if start >= 0:
                try:  # the line can still be cut at the window edge or
                    # interleaved with other stdout — fall through to
                    # the regex recovery rather than dying
                    parsed = json.loads(d["tail"][start:].splitlines()[0])
                except json.JSONDecodeError:
                    parsed = None
            if parsed is not None:
                d = parsed
            else:
                qs = dict((k, float(v)) for k, v in re.findall(
                    r'"(q[0-9]+[a-z]*(?:_[a-z0-9_]+)?)":\s*([0-9.]+)',
                    d["tail"]))
                if not qs:
                    raise SystemExit(f"{path}: no bench data in tail")
                print(f"note: {path} tail is partial; recovered "
                      f"{len(qs)} per-query entries, totals partial")
                d = {"queries": qs, "failed": []}
    qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    if d.get("value") is None:
        d["value"] = sum(qs.values())
    return d, qs


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_doc, old = load(sys.argv[1])
    new_doc, new = load(sys.argv[2])
    # Driver tails carry short qNN[b] keys, bench_out.json full names;
    # when exactly one side is short, fold both to the short prefix.
    if any("_" in k for k in old) != any("_" in k for k in new):
        old = {k.split("_")[0]: v for k, v in old.items()}
        new = {k.split("_")[0]: v for k, v in new.items()}
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    newly_failed = sorted(set(new_doc.get("failed", []))
                          - set(old_doc.get("failed", [])))

    co, cn = sum(old[k] for k in common), sum(new[k] for k in common)
    print(f"old total {old_doc.get('value'):8.2f}s / {len(old)} queries"
          f"   new total {new_doc.get('value'):8.2f}s / {len(new)} queries")
    if common and co > 0:
        print(f"common subset ({len(common)} queries): "
              f"{co:.2f}s -> {cn:.2f}s  ({cn / co:.2f}x)")

    regressed = sorted(
        ((new[k] / old[k], old[k], new[k], k)
         for k in common if old[k] > 0 and new[k] / old[k] > ratio),
        reverse=True)
    for r, a, b, k in regressed:
        print(f"REGRESSED {r:5.2f}x  {a:7.3f}s -> {b:7.3f}s  {k}")
    if added:
        print(f"added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    for k in newly_failed:
        print(f"NEWLY FAILED {k}")

    if not regressed and not newly_failed:
        print(f"OK: no common query above {ratio}x, nothing newly failed")
        return 0
    return 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. piped through `head`
        sys.exit(0)
