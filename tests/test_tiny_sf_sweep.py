"""Tiny-SF robustness sweep (slow, once per round): every declared
query must RUN at sf0.001 without raising — the degenerate-data gate
(empty groups after filters, single-row aggregates, percentiles over
one value, joins with empty sides). The driver only executes entry()
at this SF today, but a fixture regeneration or a new query with an
unguarded division lands here first, not in the sf0.01 parity gate."""

from __future__ import annotations

import pytest

from energi_data_etl_spark.queries import QUERIES

from conftest import SF_TEST_DIR


@pytest.mark.slow
def test_every_query_survives_tiny_sf(spark):
    failures = []
    for name, q in QUERIES.items():
        try:
            # count() forces full execution of every partition
            q.fn(spark, SF_TEST_DIR).count()
        except Exception as exc:  # noqa: BLE001 — collecting the full tally
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "queries failing at sf0.001:\n" + "\n".join(failures)
