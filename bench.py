"""Benchmark harness (driver contract): runs the declared query catalog
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (forces every
partition to compute; no driver-side result transfer skews the timing).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    # Fixture-gate pin: sf0.1 drains are fastest at 4 state tasks; the
    # library default (no env) is defaultParallelism for real volumes.
    os.environ.setdefault("SPARK_GRAFT_DRAIN_PARTITIONS", "4")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from energi_data_etl_spark.queries import QUERIES
    from energi_data_etl_spark.session import get_spark

    spark = get_spark("energi-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JIT/session warmup on the smallest SF so the first measured query
    # doesn't pay one-time costs: flagship warms the JVM/codegen path,
    # grouped_median_udaf spawns the Python/Arrow worker pool (otherwise
    # whichever Python-path query happens to run first in catalog order
    # absorbs the pool cold-start — r06 saw a phantom 3x "regression"
    # from exactly that after a rotation reorder).
    warm_dir = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else sf_dir
    _materialize(QUERIES["flagship_daily_avg"].fn(spark, warm_dir))
    _materialize(QUERIES["grouped_median_udaf"].fn(spark, warm_dir))
    # two more one-time paths that otherwise tax whichever query runs
    # them first in catalog order (r07 saw phantom 6x/2.3x "regressions"
    # when the FIRST_50 rotation moved their owners to cold positions;
    # isolated re-runs were at r06 levels): the regex tokenizer's
    # codegen/JIT (token_count over text) and the localCheckpoint +
    # range-exchange machinery. Warmed at sf0.001 they cost ~0.3 s each.
    _materialize(QUERIES["token_budget_packing"].fn(spark, warm_dir))
    _materialize(QUERIES["global_row_index"].fn(spark, warm_dir))
    # Structured Streaming engine init (micro-batch planner, state-store
    # machinery): the r08 window rotation put seven streaming queries at
    # catalog positions 1-7, where the first one absorbed ~3 s of
    # one-time init (isolated re-runs at r07 levels). One tiny bounded
    # stream at sf0.001 pays it here instead.
    _materialize(QUERIES["streaming_tumbling_daily"].fn(spark, warm_dir))
    # ...and the Python DataSource reader machinery (interpreter worker
    # spin-up per micro-batch), which the api_source_* trio at window
    # positions 1-7 otherwise pays first.
    _materialize(QUERIES["api_source_daily_rollup"].fn(spark, warm_dir))
    # Cold-position guard (VERDICT r12 item 6): two rounds running,
    # queries newly promoted to suite positions 1-3 by the rotation
    # showed 2x "regressions" that vanished on isolated re-run — pure
    # suite-head cold-start (scheduler/codegen/page-cache). Warm the
    # head of the rotation itself, untimed, at sf0.001 so position
    # moves stop reading as per-query drift in bench_medians.
    for _name, _q in list(QUERIES.items())[:4]:
        if _q.bench:
            try:
                _materialize(_q.fn(spark, warm_dir))
            except Exception as exc:  # noqa: BLE001 — warmup must never kill the run
                print(f"warmup failed for {_name}: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if not q.bench:
            continue
        t0 = time.perf_counter()
        try:
            _materialize(q.fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench error {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Contention self-description (VERDICT r14 #4): this shared host
    # inflates single runs 5-30x NON-uniformly, so a lone BENCH_rN.json
    # can read as a regression (r14: source_overlap_matrix 48.8 s vs a
    # 3.75 s same-tree median). Carry the evidence in-band: per-query
    # ratio vs the newest committed BENCH_MEDIANS_r*.json — any >=3x
    # inflation is flagged so no consumer has to know to cross-check.
    contended = None
    try:
        import glob

        refs = sorted(
            glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_MEDIANS_r*.json")),
            key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
        )
        if refs:
            with open(refs[-1]) as fh:
                ref_doc = json.load(fh)
            # the ratios are only meaningful at the reference's scale
            # factor — at any other SF every query is legitimately
            # slower and the hint would cry wolf on the whole suite
            ref_medians = ref_doc.get("medians", {}) if ref_doc.get("sf") == sf else {}
            flagged = sorted(
                (
                    (round(ratio, 1), k)
                    for k, t in timings.items()
                    if t >= 1.0 and ref_medians.get(k, 0) > 0
                    and (ratio := t / ref_medians[k]) >= 3.0
                ),
                reverse=True,
            )
            contended = {
                "ref": os.path.basename(refs[-1]),
                "n": len(flagged),
                "worst": {k: r for r, k in flagged[:5]},
            }
    except Exception as exc:  # noqa: BLE001 — the hint must never kill the bench
        print(f"contention hint unavailable: {exc}", file=sys.stderr)
    # Full per-query detail FIRST (~8 KB for 267 queries — exceeds the
    # driver's ~2000-char stdout-tail capture, which is why BENCH_r01..r10
    # all recorded "parsed": null when this was the only line).
    print(json.dumps({"metric": "declared_query_detail", "queries": timings}))
    sys.stdout.flush()
    # Compact aggregate LAST (< 2000 chars) so the driver's tail capture
    # contains one complete, parseable JSON line: totals + the 10 slowest
    # per-query timings (VERDICT r10 item 4).
    slowest10 = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v >= 0),
            key=lambda kv: -kv[1],
        )[:10]
    )
    n_errors = sum(1 for t in timings.values() if t < 0)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": slowest10,
                "sf": sf,
                "n_queries": len(timings),
                "n_errors": n_errors,
                "cpus": cpus,
                "contended": contended,
                "note": "full per-query timings on the preceding stdout line",
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
