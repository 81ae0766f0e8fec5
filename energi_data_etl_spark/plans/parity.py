"""Differential-testing harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 check (row-count + schema + order-insensitive
value comparison) so every declared query is validated locally before
the driver runs it (SURVEY.md §5.2 item 1).
"""

from __future__ import annotations

import decimal
import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from ..sources.tables import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the corpus tables as DuckDB views, like the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _temporal_str(v):
    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return None
    s = v.isoformat()
    return s[:-9] if s.endswith("T00:00:00") else s  # DATE vs midnight-TIMESTAMP parity


def _canon_value(v):
    if v is None:
        return None
    if hasattr(v, "isoformat"):
        return _temporal_str(v)
    if hasattr(v, "tolist"):  # numpy array / scalar
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, float):
        return round(v, 9)
    return v


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by all columns, values normalized to comparable primitives."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.map(_temporal_str)
        elif pd.api.types.is_float_dtype(s):
            # queries round explicitly; this guards representation noise only
            out[c] = s.round(9)
        elif s.dtype == object:
            out[c] = s.map(_canon_value)
    out = out.sort_values(by=list(out.columns), kind="mergesort", na_position="last").reset_index(drop=True)
    return out


def _dtype_family(s: pd.Series) -> str | None:
    """Numeric family of a result column: 'int' / 'float' / 'bool', or
    None for temporals/strings/complex (value-canonicalized elsewhere).

    The REAL driver's value hash distinguishes int 123 from float 123.0
    (r06: DuckDB SUM(int)→HUGEINT→float64 vs Spark int64 failed 11 hash
    gates while this harness's float() coercion passed them all). Width
    within a family (int32 vs int64) does NOT matter to the driver —
    certified queries with INTEGER-vs-BIGINT parity pass — so the check
    is family-level, not itemsize-level."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "O":
        for v in s:
            if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
                continue
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, (float, decimal.Decimal)):
                return "float"
            return None
    return None


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            # EXACT after the round(9) canonicalization in _canon — no
            # rel_tol: at 1e8-magnitude sums rel_tol=1e-9 silently forgave
            # ~0.5 absolute, which is how a 2dp cent-level mismatch passed
            # driver_sim while the real driver's hash compare would fail
            # (ADVICE r05 medium). Queries round explicitly, so any residual
            # difference is a real cross-engine divergence and must fail.
            return fa == fb
    except (TypeError, ValueError):
        pass
    if (a is None or (isinstance(a, float) and math.isnan(a))) != (b is None or (isinstance(b, float) and math.isnan(b))):
        return False
    return a == b


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return ParityResult(name, False, f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
    if len(spark_pdf) != len(oracle_pdf):
        return ParityResult(name, False, f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    for c in sorted(spark_pdf.columns):
        fa, fb = _dtype_family(spark_pdf[c]), _dtype_family(oracle_pdf[c])
        if fa is not None and fb is not None and fa != fb:
            return ParityResult(
                name, False,
                f"dtype-family mismatch col={c}: spark={fa}({spark_pdf[c].dtype}) "
                f"oracle={fb}({oracle_pdf[c].dtype}) — the driver hash distinguishes 123 from 123.0",
            )
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            a = None if (a is pd.NA or (isinstance(a, float) and pd.isna(a))) else a
            b = None if (b is pd.NA or (isinstance(b, float) and pd.isna(b))) else b
            if not _values_equal(a, b):
                return ParityResult(name, False, f"value mismatch col={c} row={i}: spark={a!r} oracle={b!r}")
    return ParityResult(name, True, f"{len(s)} rows")


def complex_output_columns(df) -> list[str]:
    """Array/Map/Struct output columns — the driver canonicalizer sorts
    result cells, and complex cells arrive as unhashable ndarrays in
    pandas and ERR the whole query (cost three rounds: array_surface/
    map_functions r01, winnowing/multimodal r03). Serialize arrays to
    strings per the array_surface recipe (queries/functions.py)."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def check_query(spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, fn, oracle: str, sf_dir: str) -> ParityResult:
    sdf = fn(spark, sf_dir)
    bad = complex_output_columns(sdf)
    if bad:
        return ParityResult(name, False, f"complex-typed output columns {bad} (driver canonicalizer would ERR)")
    spark_pdf = sdf.toPandas()
    oracle_pdf = con.execute(oracle).df()
    return compare_frames(name, spark_pdf, oracle_pdf)
