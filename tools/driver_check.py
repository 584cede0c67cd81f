"""Driver-faithful correctness check: Spark vs DuckDB through *pandas*.

The external driver compares each query by materializing BOTH sides to
pandas (Spark ``toPandas()``; DuckDB ``.df()``), canonicalizing (columns
sorted by name, rows sorted), and hashing the rendered cell values. That
hash is sensitive to pandas *dtype* — ``Decimal('5.000000')`` in an object
column and ``5.0`` in a float64 column are numerically equal but hash
differently. ``tests/oracle.py`` normalizes Decimals away, so it cannot
reproduce that class of failure; this tool can.

PASS here requires, per canonical column:
  * compatible dtype kind (ints of any width together; floats together;
    datetime64 of any unit together; bool; object),
  * exact rendered-value equality — object cells compare as
    ``type(v).__name__ + ':' + str(v)`` so Decimal-vs-float and
    date-vs-Timestamp mismatches are caught, not erased.

Usage:
    python tools/driver_check.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KIND_CLASS = {"i": "int", "u": "int", "f": "float", "M": "ts", "b": "bool", "O": "obj"}


def _render_cell(v) -> str:
    """Render one canonical cell the way a str()-based hash would see it."""
    if v is None:
        return "None"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if v is pd.NaT:
        return "NaT"
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        return f"ts:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, (np.floating, float)):
        return f"float:{float(v)!r}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"int:{int(v)}"
    if isinstance(v, (np.bool_, bool)):
        return f"bool:{bool(v)}"
    return f"{type(v).__name__}:{v}"


def canonicalize(pdf: pd.DataFrame):
    """Sort columns by name; return (colnames, dtype-classes, sorted row renders)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    classes = []
    for c in cols:
        k = pdf[c].dtype.kind
        classes.append(KIND_CLASS.get(k, k))
    rows = [tuple(_render_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return cols, classes, rows


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, max_diffs: int = 5):
    """Return a list of human-readable problems ([] == driver hash would match)."""
    problems = []
    s_cols, s_cls, s_rows = canonicalize(spark_pdf)
    d_cols, d_cls, d_rows = canonicalize(duck_pdf)
    if s_cols != d_cols:
        return [f"columns differ: spark={s_cols} duckdb={d_cols}"]
    for c, sk, dk in zip(s_cols, s_cls, d_cls):
        if sk != dk:
            problems.append(
                f"dtype class mismatch on {c!r}: spark={sk} "
                f"({spark_pdf[c].dtype}) duckdb={dk} ({duck_pdf[c].dtype})"
            )
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
        return problems
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if sr != dr:
            n_bad += 1
            if n_bad <= max_diffs:
                for c, sv, dv in zip(s_cols, sr, dr):
                    if sv != dv:
                        problems.append(f"row#{i} col {c!r}: spark={sv} duckdb={dv}")
    if n_bad > max_diffs:
        problems.append(f"... {n_bad} differing rows total")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all registered)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--arrow", action="store_true", help="enable Arrow in toPandas")
    args = ap.parse_args()

    from mapreduce_framework_spark.registry import all_queries
    from mapreduce_framework_spark.session import get_spark
    from tests.oracle import duckdb_conn

    specs = all_queries()
    names = args.queries or list(specs)
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(
        "driver-check",
        extra_conf={
            "spark.sql.execution.arrow.pyspark.enabled": str(args.arrow).lower()
        },
    )
    con = duckdb_conn(args.sf_dir)
    failed = []
    for name in names:
        spec = specs[name]
        if spec.oracle is None:
            # rows-only at the driver; still exercise toPandas for crashes
            try:
                pdf = spec.builder(spark, args.sf_dir).toPandas()
                canonicalize(pdf)
                print(f"{name}: NO_ORACLE rows={len(pdf)} (canonicalize ok)")
            except Exception as e:  # noqa: BLE001
                failed.append(name)
                print(f"{name}: NO_ORACLE CRASH {e}")
            continue
        try:
            spark_pdf = spec.builder(spark, args.sf_dir).toPandas()
            duck_pdf = con.execute(spec.oracle).df()
            problems = compare_frames(spark_pdf, duck_pdf)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        if problems:
            failed.append(name)
            print(f"{name}: FAIL")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"{name}: ok ({len(spark_pdf)} rows)")
    con.close()
    print(f"\n{len(names) - len(failed)}/{len(names)} driver-faithful pass")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
