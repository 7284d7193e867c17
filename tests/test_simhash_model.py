"""Property test: the Spark 64-bit SimHash signature pipeline equals
an independent pure-Python model of the definition (tf-weighted
Charikar signature over md5 token bits, two 32-bit halves).

The Spark side is an intricate expression tree (conv() hex parses, 64
conditional sums); this model is 15 lines of obvious Python —
agreement on randomized corpora pins the expressions to the spec."""

from __future__ import annotations

import pytest

import hashlib
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_distributed_systems_spark.operators.simhash64 import (
    simhash64_signatures,
)

WORDS = ["spark", "Shuffle", "key", "VALUE", "agg", "x", "Partition"]

doc_strategy = st.lists(
    st.one_of(st.sampled_from(WORDS), st.text(alphabet="abcXYZ", min_size=1, max_size=6)),
    min_size=1,
    max_size=30,
).map(" ".join)


def model_signature(text: str) -> tuple[int, int]:
    toks = re.findall(r"[A-Za-z]+", text)  # ascii form of [^\p{L}]+ split
    weights = Counter(toks)
    halves = []
    for start in (0, 8):
        acc = [0] * 32
        for tok, w in weights.items():
            val = int(hashlib.md5(tok.encode()).hexdigest()[start : start + 8], 16)
            for b in range(32):
                acc[b] += w if val & (1 << b) else -w
        halves.append(sum(1 << b for b in range(32) if acc[b] > 0))
    return halves[0], halves[1]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(doc_strategy, min_size=1, max_size=6))
@pytest.mark.slow  # driver-budget profile, see pytest.ini
def test_spark_signature_matches_python_model(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.sim_hi, r.sim_lo)
        for r in simhash64_signatures(df).collect()
    }
    want = {i: model_signature(t) for i, t in enumerate(docs)}
    assert got == want
