"""Tokenizer fidelity on non-ASCII input (SURVEY.md §7 risk 2).

The reference splits on runs of non-letters via Go unicode.IsLetter
(mrapps/wc.go:24-27). Our engine uses Java-regex `[^\\p{L}]+` (Spark)
and RE2 `[^\\p{L}]+` (DuckDB oracle). All three must agree on the
Unicode Letter category — pinned here by a hypothesis property test
over an alphabet spanning Latin, Latin-1, Greek, Cyrillic, CJK,
digits, punctuation, and whitespace.
"""

from __future__ import annotations

import unicodedata

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_distributed_systems_spark.functions.text import words

ALPHABET = (
    "abcXYZ äöüß éàç λΩπ ЖфЯ 漢字かなハン 123 ,.!?;:-_()[]'\"\t\n@#%&*+=/\\|<>~`"
)


def model_tokenize(text: str) -> list[str]:
    """Go unicode.IsLetter ≙ Unicode general category L*."""
    out, cur = [], []
    for ch in text:
        if unicodedata.category(ch).startswith("L"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from mapreduce_distributed_systems_spark.session import get_spark

        _spark = get_spark("tests")
    return _spark


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=st.lists(st.text(alphabet=ALPHABET, max_size=80), min_size=1, max_size=8))
def test_three_tokenizers_agree(texts):
    spark = _get_spark()
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    spark_toks = [r.t for r in df.select(words("text").alias("t")).collect()]

    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"text": texts}))
    duck_toks = [
        r[0]
        for r in con.execute(
            "SELECT list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), "
            "x -> x <> '') FROM docs"
        ).fetchall()
    ]
    con.close()

    model = [model_tokenize(t) for t in texts]
    assert spark_toks == model, "Spark \\p{L} diverged from Go IsLetter model"
    assert duck_toks == model, "DuckDB RE2 \\p{L} diverged from Go IsLetter model"
