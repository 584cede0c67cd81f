"""Iterative graph algorithm: connected components of the near-duplicate
graph — dedup *clustering* (each component keeps one canonical doc).

This is the engine's genuinely-iterative operator (SURVEY's "iterative
algorithms" category): driver-controlled label propagation with
``localCheckpoint`` lineage truncation each round — the pattern that keeps
iterative Spark jobs viable at scale (without truncation the plan grows
per iteration and the DAG scheduler chokes).

The DuckDB oracle computes the same components with a recursive CTE
(min reachable node id), so even the iterative path is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.pipeline.dedup import (
    _DROP_LIST_DUCK,
    q30_ngram_jaccard_neardup,
)
from mapreduce_framework_spark.registry import register

MAX_ITERS = 20


def connected_components(edges: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """(u, v) undirected edges → (doc_id, component=min node id in component).

    Label propagation to fixpoint; each round is one join + aggregate, with
    eager localCheckpoint so iteration N+1 doesn't replan/recompute rounds
    1..N. Converges in O(graph diameter) rounds.
    """
    # materialize the edge list once — without this every iteration's join
    # AND the convergence check would recompute the (possibly expensive)
    # upstream plan that produced the edges
    sym = (
        edges.select("u", "v")
        .unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("u").alias("id")).distinct()
    comp = nodes.withColumn("comp", F.col("id")).localCheckpoint(eager=True)
    for _ in range(max_iters):
        neigh = (
            sym.join(comp, sym.u == comp.id)
            .groupBy(F.col("v").alias("id2"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new = (
            comp.join(neigh, comp.id == neigh.id2, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(comp.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        comp = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters)"
        )
    return comp.select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))


@register(
    "q49_neardup_components",
    # shares the single drop-list CTE definition (dedup._DROP_LIST_DUCK);
    # the unused drop_list CTE is never materialized by DuckDB
    oracle=f"""
    WITH RECURSIVE
    {_DROP_LIST_DUCK}
    SELECT doc_id, component FROM comp ORDER BY doc_id
    """,
    tags=("ext", "graph", "iterative", "dedup"),
)
def q49_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clusters: connected components over the exact near-dup pairs
    (q30). Canonical doc per cluster = min doc_id = the component label."""
    pairs = q30_ngram_jaccard_neardup(spark, sf_dir).select(
        F.col("id1").alias("u"), F.col("id2").alias("v")
    )
    return connected_components(pairs).orderBy("doc_id")
