"""Physical-plan inspection (SURVEY.md §4): the engine's "did Catalyst
do what we designed for" checks — predicate pushdown reached the scan,
small dims broadcast, projections pruned the read schema. Used by
tests/test_plans.py so plan regressions fail CI, not a 100 TB run.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan (PushedFilters)."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters line in plan:\n{plan}"
    assert any(fragment in ln for ln in pushed), f"{fragment!r} not pushed; got: {pushed}\n{plan}"


def assert_broadcast_join(df: DataFrame, n_expected: int = 1) -> None:
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= n_expected, f"expected ≥{n_expected} BroadcastHashJoin, found {n}:\n{plan}"


def scan_read_schema(df: DataFrame, table_fragment: str) -> str:
    """Return the ReadSchema of the scan whose path contains the fragment
    (column-pruning check: a 2-column projection must not read 16 columns)."""
    plan = explain_str(df)
    for block in plan.split("\n\n"):
        if table_fragment in block and "ReadSchema" in block:
            for ln in block.splitlines():
                if "ReadSchema" in ln:
                    return ln.strip()
    # formatted mode puts scans in numbered nodes; fall back to line scan
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if table_fragment in ln:
            for lj in lines[i : i + 12]:
                if "ReadSchema" in lj:
                    return lj.strip()
    raise AssertionError(f"no scan found for {table_fragment!r}:\n{plan}")
