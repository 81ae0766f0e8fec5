"""Aggregate N full bench.py runs into per-query medians — the
regression reference BASELINE.md mandates (single runs swing up to 10×
on this shared host; medians across back-to-back runs are the only
comparable number).

Usage:
    python scripts/bench_medians.py out.json run1.json run2.json [...]

Prints a comparison against BENCH_MEDIANS_r03.json (>2× regressions
flagged) and writes {runs_total_sec, median_total_sec, medians} to
out.json — same shape as BENCH_MEDIANS_r03.json.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load_run(path: str) -> dict:
    """Accept both bench.py output formats: the legacy single JSON line
    (full queries dict + value) and the r11 two-line format (detail
    line with the full per-query dict, then a compact aggregate line
    whose queries field is only the slowest-10). Lines are selected by
    MARKER, never position (ADVICE r12: a truncated aggregate line used
    to silently make the detail line the aggregate; a parseable
    non-dict line used to raise on .get)."""
    lines = []
    for ln in open(path):
        if not ln.strip():
            continue
        try:
            doc = json.loads(ln)
        except ValueError:
            continue  # tail-truncated detail line / non-JSON noise
        if isinstance(doc, dict):
            lines.append(doc)
    if not lines:
        raise ValueError(f"{path}: no parseable JSON object line")
    detail = next((d for d in lines if d.get("metric") == "declared_query_detail"), None)
    agg = next(
        (d for d in reversed(lines) if d.get("metric") != "declared_query_detail" and "value" in d),
        None,
    )
    if detail is not None:
        if agg is None:
            print(f"warning: {path}: aggregate line missing/truncated — totals unavailable",
                  file=sys.stderr)
        return {
            "queries": detail["queries"],
            "value": agg.get("value") if agg else None,
            "sf": agg.get("sf") if agg else None,
        }
    if agg is None:
        raise ValueError(f"{path}: neither detail nor aggregate line found")
    return agg


def main() -> int:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [_load_run(p) for p in run_paths]
    names = list(runs[0]["queries"])
    medians = {
        k: round(statistics.median([r["queries"][k] for r in runs if k in r["queries"]]), 3)
        for k in names
    }
    # per-query MIN across runs = the capability number on this
    # contention-prone shared host (CLAUDE.md noise protocol: a median
    # drift is only a real regression if the MIN reproduces it)
    mins = {
        k: round(min(r["queries"][k] for r in runs if k in r["queries"]), 3)
        for k in names
    }
    doc = {
        "runs_total_sec": [r["value"] for r in runs],
        "median_total_sec": round(sum(medians.values()), 3),
        "min_total_sec": round(sum(mins.values()), 3),
        "n_queries": len(medians),
        "sf": runs[0].get("sf"),
        "medians": medians,
        "mins": mins,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: {len(medians)} queries, median sum {doc['median_total_sec']}s, "
          f"min sum {doc['min_total_sec']}s (run totals {doc['runs_total_sec']})")
    try:
        ref_doc = json.load(open("BENCH_MEDIANS_r03.json"))
    except OSError:
        return 0
    ref = ref_doc["medians"]
    # flag on MEDIAN drift, verdict on MIN: contention inflates medians
    # non-uniformly; only a min that stays >2x the r03 median is code
    drifted = sorted(
        ((medians[k] / ref[k], k) for k in medians if k in ref and medians[k] > 2 * ref[k]),
        reverse=True,
    )
    for ratio, k in drifted:
        verdict = "REGRESSION (min reproduces)" if mins[k] > 2 * ref[k] else "host contention (min within 2x)"
        print(f"  >2x median drift: {k} {ref[k]:.2f}s -> median {medians[k]:.2f}s / min {mins[k]:.2f}s — {verdict}")
    if not drifted:
        print("  no >2x per-query median drift vs BENCH_MEDIANS_r03")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
