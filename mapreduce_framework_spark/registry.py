"""Central registry of declared queries (SURVEY §2.5).

Every implemented operator registers a :class:`QuerySpec` here: a builder
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the equivalent
DuckDB oracle SQL. ``__spark_entry__.py`` exposes this registry to the
driver; the pytest suite runs the same differential comparison locally.

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL twin; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side-effect: registration) and return the registry."""
    import mapreduce_framework_spark.operators.mr_queries  # noqa: F401
    import mapreduce_framework_spark.operators.relational  # noqa: F401
    import mapreduce_framework_spark.operators.kv  # noqa: F401
    import mapreduce_framework_spark.operators.windows  # noqa: F401
    import mapreduce_framework_spark.operators.sql_frontend  # noqa: F401
    import mapreduce_framework_spark.operators.skew  # noqa: F401
    import mapreduce_framework_spark.operators.graph  # noqa: F401
    import mapreduce_framework_spark.operators.functions_battery  # noqa: F401
    import mapreduce_framework_spark.operators.temporal  # noqa: F401
    import mapreduce_framework_spark.pipeline.dedup  # noqa: F401
    import mapreduce_framework_spark.pipeline.similarity  # noqa: F401
    import mapreduce_framework_spark.pipeline.text_analysis  # noqa: F401
    import mapreduce_framework_spark.pipeline.multimodal  # noqa: F401

    return dict(REGISTRY)
