"""Differential comparison: Spark DataFrame vs DuckDB oracle SQL.

Mirrors the driver's t2 gate (CORRECTNESS_r{N}.json): row count, schema
arity, and an order-insensitive value comparison with columns sorted by
name — but stricter: exact cell equality (with optional per-query float
tolerance) instead of a hash, so mismatches are debuggable.

Additionally enforces the driver's *pandas canonicalization* contract: the
driver hashes pandas-rendered values (Spark via ``toPandas``, DuckDB via
``.df()``), where a Spark DECIMAL surfaces as ``Decimal`` objects but a
DuckDB DECIMAL/HUGEINT surfaces as float64 — numerically equal cells that
hash differently. ``_check_driver_dtypes`` derives the dtype class each
engine would surface (Spark from its schema — no re-execution; DuckDB from
a cheap ``.df()`` fetch) and fails on any class mismatch, so this failure
class is caught locally without re-running the Spark plan. The full
pandas-level comparison lives in tools/driver_check.py.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if isinstance(v, Decimal):
        return ("num", str(v.normalize()))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", v)
    if isinstance(v, int):
        return ("num", str(Decimal(v).normalize()))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("ts", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm_cell(x) for x in v))
    if isinstance(v, bytearray):
        return ("bin", bytes(v))
    return (type(v).__name__, v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort(key=repr)
    return out, [colnames[i] for i in order]


def _spark_dtype_class(dt) -> str:
    """pandas dtype class a Spark column surfaces as under toPandas()."""
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "decimal-obj"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.TimestampType):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date-obj"  # datetime.date objects — NOT datetime64
    return "other"


def _duck_dtype_class(dtype, sample) -> str:
    """pandas dtype class a DuckDB column surfaces as under .df()."""
    import datetime as _dt
    from decimal import Decimal as _D

    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    if sample is None:
        return "other"
    if isinstance(sample, _D):
        return "decimal-obj"
    if isinstance(sample, _dt.datetime):
        return "ts"
    if isinstance(sample, _dt.date):
        return "date-obj"
    return "other"


def _check_driver_dtypes(spark_df, duck_pdf, spark_rows=None, spark_cols=None) -> list[str]:
    spark_cls = {f.name: _spark_dtype_class(f.dataType) for f in spark_df.schema.fields}
    # An int column that contains NULLs surfaces as float64 under pandas on
    # BOTH engines (pandas int64 can't hold NA) — not a divergence.
    null_int_cols = set()
    if spark_rows is not None and spark_cols is not None:
        for i, col in enumerate(spark_cols):
            if spark_cls.get(col) == "int" and any(r[i] is None for r in spark_rows):
                null_int_cols.add(col)
    problems = []
    for col in duck_pdf.columns:
        s = duck_pdf[col]
        nn = s.dropna()
        d_cls = _duck_dtype_class(s.dtype, nn.iloc[0] if len(nn) else None)
        s_cls = spark_cls.get(col, "other")
        if s_cls == "int" and d_cls == "float" and col in null_int_cols:
            continue
        if s_cls != d_cls and "other" not in (s_cls, d_cls):
            problems.append(
                f"driver-canonicalization dtype mismatch on {col!r}: "
                f"spark toPandas would give {s_cls}, duckdb .df() gives {d_cls} "
                f"(numerically-equal cells would hash differently at the driver)"
            )
    return problems


def compare(spark_df, sql: str, sf_dir: str, float_rtol: float | None = None) -> None:
    """Assert the Spark result equals the DuckDB result. Raises AssertionError."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        # Deliberately a SECOND execution: the dtype gate needs the dtypes
        # .df() would materialize (DECIMAL/HUGEINT -> float64, nullable
        # BIGINT -> float64), which are derivable neither from the DBAPI
        # description (everything numeric is 'NUMBER') nor from fetchall
        # values (BIGINT and HUGEINT are both plain int), and fetching rows
        # FROM the pandas frame would corrupt null handling (None -> NaN).
        dtype_problems = _check_driver_dtypes(
            spark_df, con.execute(sql).df(), spark_rows, spark_cols
        )
    finally:
        con.close()
    assert not dtype_problems, "\n".join(dtype_problems)

    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )

    s_norm, cols = _normalize(spark_rows, spark_cols)
    d_norm, _ = _normalize(duck_rows, duck_cols)

    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        if sr == dr:
            continue
        if float_rtol is not None and _close(sr, dr, float_rtol):
            continue
        mismatches.append((i, sr, dr))
        if len(mismatches) >= 5:
            break
    assert not mismatches, _render(mismatches, cols)


def _close(sr, dr, rtol) -> bool:
    if len(sr) != len(dr):
        return False
    for a, b in zip(sr, dr):
        if a == b:
            continue
        if a[0] in ("float", "num") and b[0] in ("float", "num"):
            try:
                fa, fb = float(a[1]), float(b[1])
            except (TypeError, ValueError):
                return False
            if not math.isclose(fa, fb, rel_tol=rtol, abs_tol=rtol):
                return False
        else:
            return False
    return True


def _render(mismatches, cols) -> str:
    lines = [f"value mismatch (cols sorted by name: {cols}); first {len(mismatches)}:"]
    for i, sr, dr in mismatches:
        lines.append(f"  row#{i} spark ={sr}")
        lines.append(f"  row#{i} duckdb={dr}")
    return "\n".join(lines)
