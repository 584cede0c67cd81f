"""Corpus-shaping operators for LLM training-data pipelines: deterministic
stratified sampling, sequence packing, and benchmark-contamination checks.

These are the operations that turn a deduped corpus into a training mix,
and each is built to the 100 TB shape:

- **Stratified hash sampling (q78)** — per-language keep rates applied via
  a *deterministic* content-independent hash of the doc_id (FNV-1a32, the
  same JVM expression family as the dedup stack). No RNG: the sample is
  reproducible across runs, engines, and partitionings (``sample()``/
  ``TABLESAMPLE`` are partition-order-dependent and can't be
  oracle-checked). Narrow scan, zero shuffles.
- **Sequence packing (q79)** — assign documents to fixed-token-budget
  training sequences by running token count. Packing is per-source
  (PARTITION BY source), not global: a global running sum serializes on
  one task, while per-shard packing parallelizes and matches how corpora
  ship (per-source shards). One window shuffle on source.
- **Contamination check (q80)** — documents sharing word-3-gram shingles
  with a benchmark set (here: the lowest doc_ids stand in for the eval
  set). The benchmark side is tiny and broadcasts; the corpus side
  streams through one shuffle-free shingle explode + broadcast join.

The reference has no sampling/packing surface (batch MR only); these are
[EXT] operators required by the training-pipeline target (SURVEY §7 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.pipeline.dedup import (
    SHINGLES_DUCK,
    TOKS_DUCK,
    TOKS_SPARK,
    _DROP_LIST_DUCK,
    _fnv_duck,
    _fnv_sql,
)
from mapreduce_framework_spark.registry import register

# per-language keep rates out of 100 — the up/down-sampling a training mix
# applies per stratum (keep all English, half the mid-resource languages,
# a quarter of zh in this synthetic corpus)
LANG_RATES = {"en": 100, "de": 50, "fr": 50, "es": 50, "zh": 25}
_SALT = "'sample-'"  # hash domain separator; keeps q78 independent of q09

_RATE_CASE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in LANG_RATES.items())
    + " ELSE 0 END"
)


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Library form of the q78 rule over any (doc_id, lang, ...) frame:
    keep a row iff FNV(salt || doc_id) mod 100 < rate(lang), with the
    bucket column attached. Per-row decisions depend only on the row, so
    sampling a subset equals restricting the sample of the superset."""
    h = F.expr(_fnv_sql(f"concat({_SALT}, CAST(doc_id AS STRING))"))
    return docs.withColumn("bucket", (h % 100).cast("long")).where(
        F.col("bucket") < F.expr(_RATE_CASE_SQL)
    )


@register(
    "q78_stratified_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           CAST({_fnv_duck(f"concat({_SALT}, CAST(doc_id AS VARCHAR))")} % 100 AS BIGINT) AS bucket
    FROM documents
    WHERE {_fnv_duck(f"concat({_SALT}, CAST(doc_id AS VARCHAR))")} % 100 < {_RATE_CASE_SQL}
    ORDER BY doc_id
    """,
    tags=("ext", "sampling"),
)
def q78_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: keep a doc iff
    FNV(salt || doc_id) mod 100 < rate(lang). Reproducible by construction
    — rerunning over a grown corpus keeps exactly the same decisions for
    old docs (the property incremental training-data pipelines need)."""
    docs = table(spark, "documents", sf_dir)
    return (
        stratified_sample(docs)
        .select("doc_id", "lang", "source", "bucket")
        .orderBy("doc_id")
    )


SEQ_LEN = 128  # token budget per packed training sequence

# the packing rule, shared by q79/q81 on both engines: a doc's sequence is
# the one its cumulative token offset (per source, doc_id order) falls in
_PACK_START_DUCK = """COALESCE(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"""


def pack_sequences(df: DataFrame) -> DataFrame:
    """Assign (doc_id, source, n_tokens, ...) rows to fixed-token-budget
    sequences: adds seq_id = running-token-offset div SEQ_LEN per source."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn("seq_id", F.expr(f"start_tok div {SEQ_LEN}"))


@register(
    "q79_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({TOKS_DUCK}) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens, {_PACK_START_DUCK} AS start_tok
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(start_tok // {SEQ_LEN} AS BIGINT) AS seq_id
    FROM c ORDER BY doc_id
    """,
    tags=("ext", "sampling", "packing"),
)
def q79_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-token-budget sequences: a doc starts in
    the sequence its cumulative token offset falls into (per source, in
    doc_id order — the deterministic contiguous-packing rule). seq_id is
    per-source; (source, seq_id) is the training-sequence key."""
    docs = table(spark, "documents", sf_dir)
    t = token_counts(docs)  # default = JVM word tokens (oracle form);
    # production budgets plug a real tokenizer via token_counts(docs, tok)
    return pack_sequences(t).select(
        "doc_id", "source", "n_tokens", "seq_id"
    ).orderBy("doc_id")


# --- domain mixing (q90) ---------------------------------------------------
# Training mixes re-weight sources toward a target distribution: compute the
# per-source keep RATE from the observed token mass, then apply it with the
# same deterministic hash rule as q78. Weighted sources (the "high-quality"
# tier) get 2× the share of the rest; the overall budget is BUDGET_PCT of
# the corpus tokens. All rate arithmetic is integer (floor division), so the
# computed rates — not just the sampling decisions — are cross-engine exact.
MIX_BUDGET_PCT = 50
_WEIGHTED_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_WEIGHT_CASE = (
    "CASE WHEN source IN ("
    + ", ".join(f"'{s}'" for s in _WEIGHTED_SOURCES)
    + ") THEN 2 ELSE 1 END"
)
_MIX_SALT = "'mix-'"  # hash domain separator; independent of q78's decisions


def domain_mix_sample(docs: DataFrame) -> DataFrame:
    """Resample any (doc_id, source, text, ...) frame toward the target
    mixture: rate(source) = min(100, 100 * target_tokens / source_tokens)
    where target_tokens = budget * weight / total_weight. Two tiny
    aggregates (partial-agg shuffle on source, then a 1-row global) feed a
    broadcast join back onto the scan.

    The narrow (doc_id, source, n_tokens) frame is materialized ONCE
    (round 14, guide §5 / the in-repo localCheckpoint pattern): both its
    consumers — the per-source token aggregate and the rate join-back —
    previously re-scanned AND re-tokenized the full corpus, because
    Catalyst does not reuse common subplans. The output carries no text,
    so the checkpointed bytes are ~24 B/doc (vs re-tokenizing the corpus:
    at 100 TB that is ~100 GB materialized against a second 100 TB
    scan+split pass). A/B at a 30× corpus: ~25% faster
    (OPTIMIZATION_r14.md §5); plan: 2 parquet scans → 1."""
    tok = docs.select(
        "doc_id", "source", F.size(F.expr(TOKS_SPARK)).cast("long").alias("n_tokens")
    ).localCheckpoint(eager=True)
    per = tok.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens")).withColumn(
        "w", F.expr(_WEIGHT_CASE).cast("long")
    )
    # Totals via a window over the per-source frame (tens of rows), NOT a
    # second aggregate branch: Catalyst does not reuse common subplans, so
    # deriving totals from `tok` again would rescan the 100 TB corpus a
    # third time. The single-partition window is over |sources| rows only.
    from pyspark.sql.window import Window

    w_all = Window.partitionBy(F.lit(1))
    # The zero-token-source guard must be a CASE (lazy branches): under
    # ANSI mode the bare `div src_tokens` raises DIVIDE_BY_ZERO, so one
    # source shard of empty/whitespace docs would kill the whole job.
    # rate = 100 is the continuous limit of min(100, target/src) as
    # src → 0⁺: token-free docs cost no budget, so they all stay.
    rates = per.withColumn(
        "total_tokens", F.sum("src_tokens").over(w_all)
    ).withColumn("total_w", F.sum("w").over(w_all)).select(
        "source",
        "src_tokens",
        F.expr(
            f"CASE WHEN src_tokens = 0 THEN CAST(100 AS BIGINT) "
            f"ELSE CAST(least(100, (100 * (((total_tokens * {MIX_BUDGET_PCT}) div 100)"
            f" * w div total_w)) div src_tokens) AS BIGINT) END"
        ).alias("rate"),
    )
    h = F.expr(_fnv_sql(f"concat({_MIX_SALT}, CAST(doc_id AS STRING))"))
    return (
        tok.join(F.broadcast(rates), "source")
        .withColumn("bucket", (h % 100).cast("long"))
        .where(F.col("bucket") < F.col("rate"))
    )


@register(
    "q90_domain_mix_resample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({TOKS_DUCK}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    per AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens,
             CAST({_WEIGHT_CASE} AS BIGINT) AS w
      FROM t GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(w) AS BIGINT) AS total_w
      FROM per
    ),
    r AS (
      SELECT source, src_tokens,
             CASE WHEN src_tokens = 0 THEN CAST(100 AS BIGINT)
                  ELSE CAST(least(100, (100 * (((total_tokens * {MIX_BUDGET_PCT}) // 100)
                       * w // total_w)) // src_tokens) AS BIGINT) END AS rate
      FROM per, tot
    )
    SELECT t.doc_id, t.source, t.n_tokens, r.rate,
           CAST({_fnv_duck(f"concat({_MIX_SALT}, CAST(doc_id AS VARCHAR))")} % 100 AS BIGINT) AS bucket
    FROM t JOIN r USING (source)
    WHERE {_fnv_duck(f"concat({_MIX_SALT}, CAST(doc_id AS VARCHAR))")} % 100 < r.rate
    ORDER BY doc_id
    """,
    tags=("ext", "sampling", "mixing"),
)
def q90_domain_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing resample: per-source keep rates computed from observed
    token mass toward a weighted target mixture, applied with the
    deterministic q78 hash rule. The rates themselves are integer
    arithmetic (exact on both engines); the output is the resampled corpus
    with its rate and hash bucket."""
    docs = table(spark, "documents", sf_dir)
    return domain_mix_sample(docs).select(
        "doc_id", "source", "n_tokens", "rate", "bucket"
    ).orderBy("doc_id")


BENCHMARK_MAX_ID = 50  # docs below this id stand in for the eval set


@register(
    "q80_contamination_check",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_DUCK} AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id, unnest({SHINGLES_DUCK}) AS s FROM t),
    bench AS (SELECT doc_id, s FROM sh WHERE doc_id < {BENCHMARK_MAX_ID}),
    corpus AS (SELECT doc_id, s FROM sh WHERE doc_id >= {BENCHMARK_MAX_ID})
    SELECT c.doc_id,
           CAST(count(DISTINCT c.s) AS BIGINT) AS n_shared_shingles,
           CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_benchmark_docs
    FROM corpus c JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
    tags=("ext", "sampling", "contamination"),
)
def q80_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination stats over the sf corpus, with the lowest
    doc_ids standing in for the eval set (see :func:`contamination_check`,
    the library form over any corpus/benchmark split)."""
    docs = table(spark, "documents", sf_dir)
    return contamination_check(docs).orderBy("doc_id")


def contamination_check(
    docs: DataFrame, bench_max_id: int = BENCHMARK_MAX_ID
) -> DataFrame:
    """Library form of q80: for each corpus doc (doc_id >= bench_max_id),
    how many of its word 3-gram shingles appear in the benchmark set
    (doc_id < bench_max_id), and how many benchmark docs it overlaps.
    The benchmark shingle set broadcasts (eval sets are tiny); the corpus
    side never self-joins. Docs sharing no shingle emit no row."""
    from mapreduce_framework_spark.pipeline.dedup import shingles_of

    sh = shingles_of(docs)
    bench = sh.where(F.col("doc_id") < bench_max_id).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    corpus = sh.where(F.col("doc_id") >= bench_max_id)
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


# quality gate in pure integer arithmetic (cross-engine exact by
# construction): enough tokens, and punctuation under 30% of characters
MIN_TOKENS = 5
_PUNCT_SPARK = "length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))"


@register(
    "q81_training_corpus",
    oracle=f"""
    WITH RECURSIVE
    {_DROP_LIST_DUCK},
    kept AS (
      SELECT * FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM drop_list)
    ),
    q AS (
      SELECT doc_id, lang, source,
             CAST(len({TOKS_DUCK}) AS BIGINT) AS n_tokens,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM kept
    ),
    f AS (
      SELECT * FROM q
      WHERE n_tokens >= {MIN_TOKENS} AND 10 * n_punct <= 3 * n_chars
        AND {_fnv_duck(f"concat({_SALT}, CAST(doc_id AS VARCHAR))")} % 100 < {_RATE_CASE_SQL}
    ),
    c AS (
      SELECT doc_id, lang, source, n_tokens, {_PACK_START_DUCK} AS start_tok
      FROM f
    )
    SELECT doc_id, lang, source, n_tokens,
           CAST(start_tok // {SEQ_LEN} AS BIGINT) AS seq_id
    FROM c ORDER BY doc_id
    """,
    tags=("ext", "sampling", "pipeline", "flagship"),
)
def q81_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data deliverable (library form:
    :func:`training_corpus` — this registered entry runs it without a
    benchmark index so the DuckDB oracle stays the 4-stage composition;
    the decontaminated 5-stage form has its own 2-corpus DuckDB
    differential in tests/test_sampling.py)."""
    return training_corpus(table(spark, "documents", sf_dir)).orderBy("doc_id")


# q105: the FULL 5-stage flagship (dedup → span-decontaminate → quality →
# sample → pack), registered with its 2-corpus DuckDB oracle. The corpus
# splits by a content-independent hash rule shared by both engines: doc_id
# % 17 == 0 plays the benchmark/eval set, the rest the training crawl —
# the same split tests/test_sampling.py's local differential has pinned
# since round 6. The Spark side builds the span_index artifact from the
# bench split inline (the registry convenience form, like q91's index
# rebuild; production persists span_index once per benchmark release) and
# feeds it to training_corpus(benchmark_index=...); the oracle re-derives
# every stage in SQL with the drop list and shingling bound to the train
# split.
_Q105_SPLIT = 17  # doc_id % 17 == 0 → benchmark side


def _q105_oracle() -> str:
    from mapreduce_framework_spark.pipeline.span_dedup import EXSUB_W, _sliding_duck

    from mapreduce_framework_spark.pipeline.dedup import _drop_list_duck

    W = EXSUB_W
    sl = _sliding_duck(W)
    return f"""
    WITH RECURSIVE
    train AS (SELECT * FROM documents WHERE doc_id % {_Q105_SPLIT} <> 0),
    bench AS (SELECT * FROM documents WHERE doc_id % {_Q105_SPLIT} = 0),
    {_drop_list_duck("train")},
    kept AS (
      SELECT * FROM train
      WHERE doc_id NOT IN (SELECT doc_id FROM drop_list)
    ),
    bt AS (SELECT doc_id, {TOKS_DUCK} AS toks FROM bench),
    bref AS (
      SELECT DISTINCT md5(s) AS sh FROM (SELECT unnest({sl}) AS s FROM bt)
    ),
    kt AS (SELECT doc_id, lang, source, {TOKS_DUCK} AS toks FROM kept),
    kraw AS (
      SELECT doc_id, unnest({sl}) AS s,
             unnest(range(1, len({sl}) + 1)) AS pos
      FROM kt
    ),
    hits AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM kraw
      WHERE md5(s) IN (SELECT sh FROM bref)
    ),
    covered AS (
      SELECT DISTINCT doc_id, CAST(unnest(range(pos, pos + {W})) AS BIGINT) AS tpos
      FROM hits
    ),
    tok_rows AS (
      SELECT doc_id, unnest(toks) AS tok,
             CAST(unnest(range(1, len(toks) + 1)) AS BIGINT) AS tpos
      FROM kt
    ),
    clean AS (
      SELECT doc_id, array_to_string(list(tok ORDER BY tpos), ' ') AS text
      FROM tok_rows ANTI JOIN covered USING (doc_id, tpos)
      GROUP BY doc_id
    ),
    dk AS (
      SELECT k.doc_id, k.lang, k.source, coalesce(c.text, '') AS text
      FROM kept k LEFT JOIN clean c USING (doc_id)
    ),
    q AS (
      SELECT doc_id, lang, source,
             CAST(len({TOKS_DUCK}) AS BIGINT) AS n_tokens,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM dk
    ),
    f AS (
      SELECT * FROM q
      WHERE n_tokens >= {MIN_TOKENS} AND 10 * n_punct <= 3 * n_chars
        AND {_fnv_duck(f"concat({_SALT}, CAST(doc_id AS VARCHAR))")} % 100 < {_RATE_CASE_SQL}
    ),
    pk AS (
      SELECT doc_id, lang, source, n_tokens, {_PACK_START_DUCK} AS start_tok
      FROM f
    )
    SELECT doc_id, lang, source, n_tokens,
           CAST(start_tok // {SEQ_LEN} AS BIGINT) AS seq_id
    FROM pk ORDER BY doc_id
    """


@register(
    "q105_training_corpus_decontaminated",
    oracle=_q105_oracle(),
    tags=("ext", "sampling", "pipeline", "flagship", "decontamination"),
)
def q105_training_corpus_decontaminated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The flagship 5-stage pretraining deliverable: near-dedup →
    benchmark span-decontamination (trim) → quality filter → stratified
    sample → sequence pack, against a benchmark split of the same corpus
    (doc_id % 17 == 0). Lee et al. 2021 §4 ordering: decontaminate BEFORE
    packing so contaminated tokens never consume sequence budget and
    trimmed-to-short docs fall to the quality filter. This registered form
    builds the span_index inline (the oracle-checked convenience path,
    like q91); production persists span_index once per benchmark release
    and reuses it — the build-once/O(batch)-probe lifecycle pinned in
    tests/test_span_dedup.py."""
    from mapreduce_framework_spark.pipeline.span_dedup import span_index

    docs = table(spark, "documents", sf_dir)
    train = docs.where(F.col("doc_id") % _Q105_SPLIT != 0)
    bench = docs.where(F.col("doc_id") % _Q105_SPLIT == 0)
    return training_corpus(train, benchmark_index=span_index(bench)).orderBy(
        "doc_id"
    )


def training_corpus(
    docs: DataFrame, benchmark_index: DataFrame | None = None, w: int | None = None
) -> DataFrame:
    """The composed training-data pipeline — near-dedup, (optional)
    benchmark decontamination, quality filter, stratified sample,
    sequence pack, in one plan:

    1. drop near-duplicates (LSH-path drop list, neardup_drop_list;
       broadcast anti-join — the corpus streams),
    2. [when ``benchmark_index`` is given] TRIM benchmark-contaminated
       spans (span_dedup.decontaminate against a persisted span_index —
       the probe side stays a semi-join on the window hash; Lee et al.
       2021 §4: decontaminate BEFORE packing, so contaminated tokens
       never consume sequence budget and trimmed-to-short docs fall to
       the quality filter),
    3. quality-filter in pure integer arithmetic (>= {MIN_TOKENS} tokens,
       punctuation <= 30% of chars — both measured on the text actually
       packed, i.e. the trimmed text when stage 2 ran),
    4. per-language deterministic hash sampling (the q78 rule),
    5. pack survivors into {SEQ_LEN}-token sequences per source (q79's
       pack_sequences).

    One broadcast join + exactly one window shuffle beyond the dedup and
    decontamination stages (pinned in test_plans); every stage is the
    scale shape of its standalone query."""
    from mapreduce_framework_spark.pipeline.dedup import neardup_drop_list

    kept = docs.join(F.broadcast(neardup_drop_list(docs)), "doc_id", "left_anti")
    if benchmark_index is not None:
        from mapreduce_framework_spark.pipeline.span_dedup import (
            EXSUB_W,
            decontaminate,
        )

        kept = decontaminate(
            benchmark_index,
            kept,
            w=EXSUB_W if w is None else w,
            carry=("lang", "source"),
        ).select("doc_id", "lang", "source", F.col("clean_text").alias("text"))

    n_punct = (F.length("text") - F.expr(_PUNCT_SPARK)).cast("long")
    q = kept.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.expr(TOKS_SPARK)).cast("long").alias("n_tokens"),
        n_punct.alias("n_punct"),
        F.length("text").cast("long").alias("n_chars"),
    )
    h = F.expr(_fnv_sql(f"concat({_SALT}, CAST(doc_id AS STRING))"))
    f = q.where(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (10 * F.col("n_punct") <= 3 * F.col("n_chars"))
        & ((h % 100) < F.expr(_RATE_CASE_SQL))
    )
    return pack_sequences(f).select("doc_id", "lang", "source", "n_tokens", "seq_id")


# --- sliding-window token chunking (q100) ------------------------------------
# The doc→training-sequence step a pretraining pipeline runs after packing
# decisions: long documents become overlapping fixed-size token windows
# (fixed chunk size, stride = half → 50% overlap) so no span is split across a
# training example boundary. Pure per-row array arithmetic: no shuffle,
# output rows ≈ tokens/stride — embarrassingly parallel at any scale.
# Window sized to the synthetic corpus (docs are 10–99 tokens) so the
# splitting path is actually exercised by the oracle; a production run
# would use e.g. 2048/1024.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 16


def chunk_documents(
    docs: DataFrame,
    chunk: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    tokenizer=None,
) -> DataFrame:
    """One row per sliding token window: (doc_id, chunk_idx, n_toks,
    chunk_fp). Short docs yield one whole-doc chunk; the final window of a
    long doc may be shorter (slice truncates). n_chunks uses integer
    ceil so both engines agree exactly.

    ``tokenizer``: optional REAL-tokenizer plug (``.encode(text) ->
    list``; a trained functions/tokenizers.BpeTokenizer or tiktoken).
    When set, the token stream comes from the tokenizer inside an
    Arrow-batched ``mapInPandas`` — same output schema, chunk_fp over the
    space-joined subword tokens — so a pipeline can budget training
    sequences with its actual model vocabulary. The default (None) keeps
    the JVM word-token path and the unchanged q100 oracle; windowing
    semantics between the two paths are pinned identical by
    tests/test_tokenizers.py's shared sequential model."""
    if tokenizer is not None:
        return _chunk_with_tokenizer(docs, chunk, stride, tokenizer)
    t = docs.select("doc_id", F.expr(TOKS_SPARK).alias("toks"))
    n_chunks = (
        f"CASE WHEN size(toks) <= {chunk} THEN 1 "
        f"ELSE 1 + ((size(toks) - {chunk} + {stride} - 1) div {stride}) END"
    )
    chunks = t.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_chunks} - 1),"
                f" i -> slice(toks, i * {stride} + 1, {chunk}))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("chunk").cast("bigint").alias("n_toks"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_fp"),
    )


def _chunk_with_tokenizer(docs, chunk, stride, tokenizer):
    """Tokenizer-backed chunking path: one Arrow pass, zero shuffles —
    the same scale shape as the JVM path (output rows ~ tokens/stride).
    The windowing arithmetic is deliberately the same expression as the
    JVM form (ceil split, slice truncation) so the two paths differ ONLY
    in where tokens come from."""
    import hashlib

    import pandas as pd

    def batches(it):
        for pdf in it:
            out = {"doc_id": [], "chunk_idx": [], "n_toks": [], "chunk_fp": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    # the JVM path yields NO chunks for NULL text
                    # (posexplode of a NULL chunk list) — same policy here
                    continue
                toks = tokenizer.encode(text)
                n = len(toks)
                n_chunks = 1 if n <= chunk else 1 + -(-(n - chunk) // stride)
                for i in range(n_chunks):
                    window = toks[i * stride : i * stride + chunk]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(i)
                    out["n_toks"].append(len(window))
                    out["chunk_fp"].append(
                        hashlib.md5(" ".join(map(str, window)).encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        batches, schema="doc_id long, chunk_idx int, n_toks long, chunk_fp string"
    )


def token_counts(docs: DataFrame, tokenizer=None) -> DataFrame:
    """(doc_id, source, n_tokens): the packing input q79 builds —
    by default the JVM word-token count (the oracle-checked form), with
    the same real-tokenizer plug as :func:`chunk_documents` so
    ``pack_sequences(token_counts(docs, tok))`` budgets sequences with
    the actual model vocabulary. Arrow-batched when plugged; never
    row-at-a-time."""
    if tokenizer is None:
        return docs.select(
            "doc_id", "source", F.size(F.expr(TOKS_SPARK)).cast("long").alias("n_tokens")
        )
    from mapreduce_framework_spark.pipeline.text_analysis import _encode_len_udf

    return docs.select(
        "doc_id", "source", _encode_len_udf(tokenizer)("text").alias("n_tokens")
    )


@register(
    "q100_token_chunking",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_DUCK} AS toks FROM documents),
    c AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= {CHUNK_TOKENS} THEN 1
                  ELSE 1 + (len(toks) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                           // {CHUNK_STRIDE} END AS n_chunks
      FROM t
    ),
    e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
    s AS (
      SELECT doc_id, chunk_idx,
             toks[chunk_idx * {CHUNK_STRIDE} + 1 :
                  chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}] AS chunk
      FROM e
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_toks,
           md5(array_to_string(chunk, ' ')) AS chunk_fp
    FROM s ORDER BY doc_id, chunk_idx
    """,
    tags=("ext", "sampling", "chunking", "pipeline"),
)
def q100_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (32-token windows, 16-token
    stride → 50% overlap): each document becomes the
    overlapping training sequences a pretraining run consumes, with the
    chunk content fingerprinted (md5 over the space-joined window) so the
    transform output itself is cross-engine-checked, not just the counts.
    Per-row array arithmetic only — zero shuffles before the presentation
    sort."""
    docs = table(spark, "documents", sf_dir)
    return chunk_documents(docs).orderBy("doc_id", "chunk_idx")
