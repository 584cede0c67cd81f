"""Generic source/sink helpers beyond parquet (catalog.py).

The reference's I/O surface is whole text files in, ``"key value"`` text
out (SURVEY §1.2); mr/runner.py reproduces those exactly. This module adds
the standard interchange formats an analytics engine is expected to speak —
CSV and JSON-lines with schema preservation — as thin, explicit wrappers so
sinks/sources are part of the tested operator inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.option("header", "true")
        .option("timestampFormat", TS_FMT)
        .schema(schema)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", TS_FMT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.option("timestampFormat", TS_FMT).schema(schema).json(path)
