"""Text-analysis operators for LLM training-data pipelines (SURVEY §7 M5).

Language-ID, quality scoring, token counting, and document fingerprinting
over the `documents` table — each a pure JVM-side DataFrame query (no
Python in the hot path) with an exact DuckDB oracle. At 100 TB these are
embarrassingly parallel scans: no shuffle except the final tiny aggregates.

The reference has no text analytics beyond wc/indexer tokenization
(src/mrapps/wc.go:23-26); these are [EXT] north-star operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.functions.hashing import fnv1a32, fnv1a32_duckdb
from mapreduce_framework_spark.functions.text import tokenize, tokenize_duckdb
from mapreduce_framework_spark.registry import register

# Tiny deterministic English stopword list for the n-gram/stopword heuristic.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
_SW_SPARK = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "q40_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {tokenize_duckdb('lower(text)')} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             len(list_filter(toks, w -> list_contains({_SW_SQL}, w))) AS n_stop
      FROM t
    )
    SELECT doc_id,
           CASE WHEN n_tokens > 0 AND CAST(n_stop AS DOUBLE) / n_tokens > 0.05
                THEN 'en' ELSE 'unknown' END AS lang_guess,
           lang AS lang_label
    FROM s ORDER BY doc_id
    """,
    tags=("ext", "text", "langid"),
)
def q40_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic (the n-gram-profile family of
    detectors reduced to its simplest deterministic form): docs whose
    lowercase stopword ratio STRICTLY exceeds 5% are tagged 'en' (see
    :func:`lang_id`, the library form)."""
    return lang_id(table(spark, "documents", sf_dir)).orderBy("doc_id")


def lang_id(docs: DataFrame) -> DataFrame:
    """Library form of q40 over any (doc_id, lang, text) frame; the ratio
    comparison is strict (> 0.05), so exactly 1 stopword in 20 tokens is
    'unknown' — pinned by tests/test_text_props.py."""
    toks = tokenize(F.lower(F.col("text")))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        F.when(
            (n_tokens > 0) & (n_stop.cast("double") / n_tokens > 0.05), "en"
        )
        .otherwise("unknown")
        .alias("lang_guess"),
        F.col("lang").alias("lang_label"),
    )


@register(
    "q41_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {tokenize_duckdb('text')} AS toks FROM documents
    )
    SELECT doc_id,
           length(text) AS n_chars,
           len(toks) AS n_tokens,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
           CAST(len(list_filter(toks, w -> length(w) >= 4)) AS DOUBLE)
             / greatest(len(toks), 1) AS long_word_ratio,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS punct_ratio
    FROM t ORDER BY doc_id
    """,
    tags=("ext", "text", "quality"),
)
def q41_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal battery: length, token count, whitespace count,
    long-word ratio, punctuation ratio — the standard cheap filters an LLM
    data pipeline applies before expensive dedup (see
    :func:`quality_signals`, the library form)."""
    return quality_signals(table(spark, "documents", sf_dir)).orderBy("doc_id")


def quality_signals(docs: DataFrame) -> DataFrame:
    """Library form of q41 over any (doc_id, text) frame; the
    greatest(·, 1) guards keep empty/token-free docs at ratio 0 instead
    of NULL or a division error."""
    toks = tokenize("text")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", "")))
        .cast("bigint")
        .alias("n_spaces"),
        (
            F.size(F.filter(toks, lambda w: F.length(w) >= 4)).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("long_word_ratio"),
        (
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("punct_ratio"),
    )


@register(
    "q42_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> w <> '')) AS ws_tokens,
           len({tokenize_duckdb('text')}) AS word_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_ish_tokens
    FROM documents ORDER BY doc_id
    """,
    tags=("ext", "text", "tokens"),
)
def q42_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, letter-run words, and a
    BPE-ish lexer regex (letter runs | digit runs | single punctuation) —
    the cheap proxy pipelines use to budget LLM token counts (see
    :func:`token_stats`, the library form)."""
    return token_stats(table(spark, "documents", sf_dir)).orderBy("doc_id")


def token_stats(docs: DataFrame, tokenizer=None) -> DataFrame:
    """Library form of q42 over any (doc_id, text) frame. NB the lexer's
    ``\\s`` is Java/RE2 semantics (ASCII whitespace only) — a unicode
    NBSP is a punctuation TOKEN, not a separator, identically on Spark
    and DuckDB (pinned by tests/test_text_props.py against an re.ASCII
    model).

    ``tokenizer``: optional REAL-tokenizer plug (anything with
    ``.encode(text) -> list`` — a trained
    functions/tokenizers.BpeTokenizer, or tiktoken when installed); adds
    a ``real_tokens`` column computed in an Arrow-batched pandas UDF
    (the sanctioned Python boundary — never row-at-a-time). The default
    (None) keeps the three JVM proxy columns and the unchanged q42
    oracle; the seam is pinned by tests/test_tokenizers.py."""
    base = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("ws_tokens"),
        F.size(tokenize("text")).alias("word_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)")
        ).alias("bpe_ish_tokens"),
        "text",
    )
    if tokenizer is None:
        return base.drop("text")
    return base.withColumn("real_tokens", _encode_len_udf(tokenizer)("text")).drop(
        "text"
    )


def _encode_len_udf(tokenizer):
    """Arrow-batched ``text -> len(tokenizer.encode(text))`` (bigint).
    The tokenizer object rides in the closure via cloudpickle; NULL text
    counts 0 (the encode contract for empty input)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def n_tokens(s):
        return s.map(lambda t: len(tokenizer.encode(t)) if t is not None else 0)

    # set REAL type objects: the module's `from __future__ import
    # annotations` would stringify inline hints into names pyspark's
    # signature inspection cannot resolve here
    n_tokens.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(n_tokens, returnType="long")


@register(
    "q43_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, {fnv1a32_duckdb('text')} AS fingerprint FROM documents
      WHERE text IS NOT NULL
    )
    SELECT f.doc_id, f.fingerprint, c.n_same
    FROM fp f
    JOIN (SELECT fingerprint, count(*) AS n_same FROM fp GROUP BY fingerprint) c
      USING (fingerprint)
    ORDER BY doc_id
    """,
    tags=("ext", "text", "fingerprint"),
)
def q43_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document rolling-hash fingerprint (FNV-1a over the byte stream,
    the same hash family as the reference partitioner src/mr/worker.go:16-20)
    plus the collision-group size — the primitive exact-dedup builds on."""
    # NULL text is excluded explicitly on BOTH engines: Spark would drop
    # such rows anyway at the NULL-keyed fingerprint equi-join, while
    # DuckDB's list_prepend treats a NULL token list like an empty one and
    # would hash NULL text equal to "" — the explicit filter replaces that
    # engine-dependent accident with stated policy (dirty-data differential)
    docs = table(spark, "documents", sf_dir).where(F.col("text").isNotNull())
    fp = docs.select("doc_id", fnv1a32("text").alias("fingerprint"))
    counts = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n_same"))
    return fp.join(counts, "fingerprint").select(
        "doc_id", "fingerprint", "n_same"
    ).orderBy("doc_id")


TFIDF_TOP_K = 3
_IDF_SCALE = 1_000_000  # integer idf surrogate: score = tf * SCALE // df


@register(
    "q92_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({tokenize_duckdb('lower(text)')}) AS word FROM documents
    ),
    tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    s AS (
      SELECT tf.doc_id, tf.word, tf.tf, df.df,
             CAST(tf.tf * {_IDF_SCALE} // df.df AS BIGINT) AS score
      FROM tf JOIN df USING (word)
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, word ASC) AS rank
      FROM s
    )
    SELECT doc_id, word, tf, df, score, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= {TFIDF_TOP_K} ORDER BY doc_id, rank
    """,
    tags=("ext", "text", "tfidf"),
)
def q92_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_K} distinguishing terms per document by a tf-idf
    surrogate (see :func:`tfidf_topk`, the library form over any corpus
    frame)."""
    return tfidf_topk(table(spark, "documents", sf_dir)).orderBy("doc_id", "rank")


def tfidf_topk(docs: DataFrame, top_k: int = TFIDF_TOP_K) -> DataFrame:
    """Library form of q92: top-``top_k`` distinguishing terms per doc by
    a tf-idf surrogate: score = tf × 10⁶ ∕ df in integer arithmetic
    (monotone in tf/df — chosen over tf·ln(N/df) so the score itself is
    cross-engine bit-exact, not just the ranking); ties break by word
    ascending. The term-frequency and document-frequency aggregates are
    both map-side partial; the tf⋈df join is keyed on word, where both
    sides are already co-partitioned after their aggregates.

    Single-scan shape (r13, guide §2.3/§2.4): df is derived FROM tf, but
    Catalyst's column pruning rewrites the df branch's partial aggregate
    to a count-free distinct — making its shuffle differ from tf's, so
    exchange reuse never fires and the corpus is scanned and tokenized
    TWICE (plans/r13/q92_tfidf_topk_before.txt operators (1)-(6) vs
    (7)-(15)). The ``tf >= 1`` filter below is a provable no-op
    (count(1) of a group is >= 1 by construction — same on both engines,
    the oracle is unchanged) whose only effect is to keep the count in
    the df branch's aggregate, making the two (doc_id, word) exchanges
    canonically identical so AQE's stage cache reuses the materialized
    shuffle: ONE scan+tokenize+partial-aggregate feeds both branches
    (ReusedQueryStage in plans/r13/q92_tfidf_topk_after_final.txt)."""
    from pyspark.sql.window import Window

    from mapreduce_framework_spark.functions.text import explode_tokens

    tok = explode_tokens(docs, F.lower(F.col("text")), out="word", keep=["doc_id"])
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.where(F.col("tf") >= 1).groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    s = tf.join(df, "word").select(
        "doc_id",
        "word",
        "tf",
        "df",
        F.expr(f"CAST(tf * {_IDF_SCALE} div df AS BIGINT)").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word").asc())
    return (
        s.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_k)
    )
