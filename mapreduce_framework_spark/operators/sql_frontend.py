"""Declarative SQL front end (absent from the reference — SURVEY §2.4
lists "any SQL/declarative front end" as a category with no reference
implementation; this engine gets one for free from Spark SQL).

Queries here run through ``spark.sql`` over registered views — proving a
user can drive the whole engine with ANSI SQL text, not just the DataFrame
API. Results are oracle-checked like every other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_framework_spark.catalog import register_views
from mapreduce_framework_spark.registry import register


@register(
    "q46_sql_frontend_join",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    tags=("ext", "sql"),
)
def q46_sql_frontend_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A join+agg written as SQL text — the exact statement also runs on
    DuckDB, demonstrating ANSI-portable surface."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY n.n_name ORDER BY n.n_name
        """
    )


# RETIRED from the registry in round 11 (registry.py policy item 4; its
# slot funded q108_quality_gated_admission — q47's SQL-text window
# surface is the demonstrative twin of the registered DataFrame forms
# q18/q19, and the SQL-frontend surface stays represented by q46).
# Builder + oracle stay permanently; dedicated differential:
# tests/test_queries_oracle.py::test_retired_q47_matches_oracle.
_Q47_SQL_FRONTEND_WINDOW_ORACLE = """
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) t WHERE rnk <= 2
    ORDER BY o_custkey, rnk, o_orderkey
    """


def q47_sql_frontend_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function via SQL text (RANK, vs q18's row_number)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, rnk FROM (
          SELECT o_custkey, o_orderkey,
                 RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders
        ) t WHERE rnk <= 2
        ORDER BY o_custkey, rnk, o_orderkey
        """
    )
