"""Data-layout utilities for 100 TB operation.

Correct results survive any layout; *fast* results at 100 TB come from four
write-time levers, each exposed here as an explicit, tested utility
(tests/test_storage.py pins the plan/footer effects):

- **Partitioned writes → partition pruning.** Directory partitioning on a
  low-cardinality column (date, event_type, lang) lets the scan list only
  matching directories — the difference between touching 1/365th of the
  files and all of them. The pruning shows up as ``PartitionFilters`` in
  the scan node.
- **Bucketed tables → co-located joins.** Pre-shuffle fact tables once at
  write time on the join key (``bucketBy``); every later equi-join on that
  key is shuffle-free (SortMergeJoin with no Exchange). At 100 TB this
  converts the dominant repeated-join shuffle into a one-time write cost.
- **Small-file compaction.** Incremental/streaming sinks produce file
  counts proportional to trigger counts; scan scheduling drowns in
  file-open overhead. Compaction rewrites to a bounded file count.
- **Range-sorted layout (Z-order-lite).** ``repartitionByRange`` +
  ``sortWithinPartitions`` yields files with disjoint min/max footer
  ranges on the sort key, so predicate pushdown skips whole files and
  row groups even without directory partitioning — the right layout for
  high-cardinality keys where directory partitioning would explode.

The reference engine's only layout decision is nReduce=10 static output
buckets (``src/main/mrcoordinator.go:23``); everything here is [EXT]
surface required by the 100 TB target.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Directory-partitioned parquet write; reads filtered on the partition
    columns prune directories (PartitionFilters in the scan)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Write an external bucketed+sorted parquet table (registered in the
    session catalog as ``name``). Joins between tables bucketed on the same
    key with the same bucket count plan with no Exchange on either side."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .option("path", path)
        .saveAsTable(name)
    )


def compact_parquet(
    spark: SparkSession, src_path: str, dst_path: str, target_files: int
) -> None:
    """Rewrite a many-file parquet dataset to at most ``target_files`` files.
    ``coalesce`` (not ``repartition``): no shuffle — each output task reads
    a contiguous group of input files."""
    spark.read.parquet(src_path).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(dst_path)


def write_range_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int
) -> None:
    """Range-partition + sort-within-partitions write: output files carry
    disjoint [min, max] footer ranges on ``sort_cols[0]``, enabling
    file/row-group skipping for range predicates on that key."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def parquet_file_column_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) footer statistics of ``column`` per parquet file under
    ``path`` — the metadata a scan consults to skip files/row groups."""
    import pyarrow.parquet as pq

    ranges = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[column]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue  # stats absent (e.g. binary cols, stats disabled)
            mins.append(st.min)
            maxs.append(st.max)
        if mins:  # skip empty files / files with no usable stats
            ranges.append((min(mins), max(maxs)))
    return ranges
