"""Three-way differential property test of the shared tokenizer — the
single expression underneath wordcount, shingles, chunking, boilerplate,
and tf-idf.

TOKS_SPARK (Spark `split` + `filter`) and TOKS_DUCK
(`string_split_regex` + `list_filter`) are assumed equivalent by every
dual-engine oracle in the repo; this suite actually pins that equivalence
on adversarial inputs the sf corpus never contains — unicode letters,
digits-only runs, regex metacharacters, leading/trailing separators,
empty strings — against a plain-Python `re` model as the third
interpretation. Any divergence between the three engines' regex
semantics for `[^a-zA-Z]+` would silently skew dozens of queries; here
it fails loudly with the exact input."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_framework_spark.pipeline.dedup import TOKS_DUCK, TOKS_SPARK
from tests.oracle import duckdb_conn


def _model_tokens(text: str) -> list[str]:
    return [w for w in re.split("[^a-zA-Z]+", text) if w]


# ASCII letters/separators plus the hazard classes: unicode letters with
# and without diacritics, digits, regex metacharacters, whitespace runs
_text = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ 09.,;-_!?*+()[]{}|\\^$\t\n") + ["é", "ß", "Ω", "中", "🙂"]
    ),
    min_size=0,
    max_size=60,
)
_corpus = st.lists(_text, min_size=1, max_size=8)


@settings(max_examples=20, deadline=None)
@given(texts=_corpus)
def test_tokenizer_three_way_equivalence(spark_global, texts):
    docs = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    got_spark = {
        r["doc_id"]: list(r["toks"])
        for r in spark_global.createDataFrame(docs)
        .select("doc_id", F.expr(TOKS_SPARK).alias("toks"))
        .collect()
    }
    con = duckdb_conn("/root/testdata/sf0.001")
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    got_duck = {
        i: list(toks)
        for i, toks in con.execute(
            f"SELECT doc_id, {TOKS_DUCK} FROM docs"
        ).fetchall()
    }
    model = {i: _model_tokens(t) for i, t in enumerate(texts)}
    assert got_spark == model
    assert got_duck == model
