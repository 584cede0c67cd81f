"""mapreduce_framework_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
``2000yeshu/mapreduce-framework`` reference (MIT 6.824 2022 labs): the
general-purpose MapReduce dataflow engine (reference ``src/mr/``), its 8
applications (``src/mrapps/``), the declared KV-store semantics
(``src/kvraft/``, ``src/models/kv.go``) — plus a relational / streaming /
LLM-data-pipeline surface built entirely on the Spark DataFrame API so
Catalyst + Tungsten own the physical plan.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing and
                   100 TB-cluster defaults (AQE, Arrow, shuffle sizing).
- ``catalog``    : loaders for the synthetic TPC-H-ish test tables.
- ``mr``         : the generic map/reduce job runner (reference parity)
                   and the 8 reference applications.
- ``functions``  : cross-engine deterministic scalar helpers (FNV-32a,
                   tokenizer, shard expr) kept JVM-side where possible.
- ``operators``  : relational query builders (joins, aggs, windows, ...)
                   and the KV event-log replay operators.
- ``streaming``  : Structured Streaming variants (windows, keyed state).
- ``pipeline``   : LLM-training-data operators (dedup, similarity
                   search, text analysis, multimodal columns).
"""

__version__ = "0.1.0"
