"""Static type lint over every DuckDB oracle: no output column may plan
to a type pandas surfaces with a different numeric family than Spark.

Why (VERDICT r06): DuckDB promotes SUM(<integer>) to HUGEINT, which
``.df()`` surfaces as float64 while Spark emits int64 — the driver's
value hash distinguishes 123 from 123.0, so 11 queries failed the r06
hash gate while driver_sim's float() coercion stayed green. This lint
reproduces that entire failure set (plus the 8 latent ones) with zero
data scanned: relation ``.types`` only plans the query.

Fix pattern: ``CAST(SUM(x) AS BIGINT)`` / ``CAST(expr AS DOUBLE)`` in
the oracle SQL (Spark's SUM(int) is already BIGINT; its averages are
already DOUBLE).
"""

from __future__ import annotations

import pytest

from energi_data_etl_spark.queries import QUERIES

# HUGEINT -> float64 vs Spark int64: the exact r06 failure class.
# DECIMAL -> float64/object: passes only when the Spark twin happens to
# be double — forbid it outright and CAST ... AS DOUBLE explicitly so
# the intent is visible in the oracle text.
FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")

ORACLED = sorted(name for name, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_output_types_have_spark_parity(duck_small, name):
    rel = duck_small.sql(QUERIES[name].oracle)
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if any(str(t).startswith(f) for f in FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle output columns {bad} plan to a DuckDB type whose "
        "pandas dtype family diverges from Spark's (HUGEINT/DECIMAL -> "
        "float64 vs int64/double) — wrap in CAST(... AS BIGINT/DOUBLE)"
    )
