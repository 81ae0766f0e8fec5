"""Pins scripts/bench_medians.py's run-file parsing (ADVICE r12): the
aggregate line is selected by MARKER, never position, so a truncated
tail or stray non-dict JSON line can't silently misattribute totals.
No Spark session — pure file parsing."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench_medians", Path(__file__).resolve().parents[1] / "scripts" / "bench_medians.py"
)
bench_medians = importlib.util.module_from_spec(_spec)
sys.modules["bench_medians"] = bench_medians
_spec.loader.exec_module(bench_medians)

DETAIL = {"metric": "declared_query_detail", "queries": {"q1": 1.5, "q2": 0.5}}
AGG = {"metric": "declared_query_suite_total", "value": 2.0, "sf": 0.1}


def _write(tmp_path, lines, name="run.json"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_two_line_format(tmp_path):
    run = bench_medians._load_run(_write(tmp_path, [json.dumps(DETAIL), json.dumps(AGG)]))
    assert run["queries"] == DETAIL["queries"] and run["value"] == 2.0 and run["sf"] == 0.1


def test_truncated_aggregate_line_keeps_detail(tmp_path, capsys):
    """A tail-truncated aggregate must NOT make the detail line the
    aggregate: queries stay full, totals become None with a warning."""
    run = bench_medians._load_run(
        _write(tmp_path, [json.dumps(DETAIL), json.dumps(AGG)[:20]])
    )
    assert run["queries"] == DETAIL["queries"]
    assert run["value"] is None and run["sf"] is None
    assert "aggregate line missing" in capsys.readouterr().err


def test_non_dict_json_lines_skipped(tmp_path):
    """A parseable bare JSON number/string must not raise on .get."""
    run = bench_medians._load_run(
        _write(tmp_path, ["42", '"noise"', json.dumps(DETAIL), json.dumps(AGG)])
    )
    assert run["queries"] == DETAIL["queries"] and run["value"] == 2.0


def test_legacy_single_line_format(tmp_path):
    legacy = {"metric": "x", "value": 3.0, "queries": {"q1": 3.0}, "sf": 0.1}
    run = bench_medians._load_run(_write(tmp_path, [json.dumps(legacy)]))
    assert run == legacy


def test_no_parseable_object_raises(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        bench_medians._load_run(_write(tmp_path, ["not json", "[1, 2]"[:4]]))
