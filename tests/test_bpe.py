"""BPE merge training (operators/bpe.py): pure-Python re-derivation
differential — the same independent-third-engine check the classifier
hash chain uses — plus structural invariants."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from mapreduce_distributed_systems_spark.operators.bpe import N_MERGES
from mapreduce_distributed_systems_spark.plans.registry import get_spec


def _python_bpe(sf_dir: str, n_merges: int):
    """Reference BPE in plain Python: word-freq table, then per round
    count adjacent pairs and greedily merge the (count desc, lexico)
    argmax across every word."""
    texts = pq.read_table(f"{sf_dir}/documents.parquet").column("text")
    wf = Counter()
    # tokenize: runs of Unicode letters, case preserved ([^\W\d_] is
    # Python's letters-only class, = \p{L} on this corpus)
    tok_re = re.compile(r"[^\W\d_]+", re.UNICODE)
    for t in texts.to_pylist():
        wf.update(tok_re.findall(t or ""))
    words = {w: (list(w), f) for w, f in wf.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for syms, f in words.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, cnt))
        for w, (syms, f) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, f)
    return merges


def test_bpe_matches_pure_python_rederivation(spark, sf_dir):
    got = [
        (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in get_spec("bpe_train_merges")
        .fn(spark, sf_dir)
        .orderBy("rank")
        .collect()
    ]
    want = _python_bpe(sf_dir, N_MERGES)
    assert got == want


def test_bpe_merge_structure(spark, sf_dir):
    rows = (
        get_spec("bpe_train_merges").fn(spark, sf_dir).orderBy("rank").collect()
    )
    assert [r.rank for r in rows] == list(range(1, N_MERGES + 1))
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.pair_count > 0
    # all learned merges distinct
    assert len({(r.left_sym, r.right_sym) for r in rows}) == N_MERGES


def test_encode_subword_counts_bounded(spark, sf_dir):
    """Merges only ever shrink a word's symbol count, never below 1:
    n_words <= n_subwords <= n_chars per document, with strict
    compression somewhere (the learned merges fire)."""
    rows = get_spec("bpe_encode_corpus").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_words <= r.n_subwords <= r.n_chars
    assert any(r.n_subwords < r.n_chars for r in rows)


def test_back_to_back_merge_matches_standard_bpe(spark):
    """The round-7 review regression: with single-pipe delimiters,
    replace('|m|a|','|ma|') strands the second occurrence in 'mama'
    ('|ma|m|a|') because adjacent matches share the middle pipe. The
    double-pipe scheme must merge BOTH ('|ma||ma|') — i.e. agree with
    true greedy BPE — on a planted corpus built entirely from
    back-to-back repeat words."""
    from mapreduce_distributed_systems_spark.operators.bpe import (
        _symbolized,
        _train_merges,
    )
    from pyspark.sql import functions as F

    wf = spark.createDataFrame(
        [("mama", 10), ("bonbon", 5), ("aaaa", 3), ("mam", 2)],
        "word string, f long",
    )
    merges, final = _train_merges(_symbolized(wf, carry_word=True), 2)
    got = {
        r["word"]: [s for s in r["w"].split("|") if s]
        for r in final.collect()
    }

    # reference: true greedy BPE over the same words
    words_py = {"mama": (list("mama"), 10), "bonbon": (list("bonbon"), 5),
                "aaaa": (list("aaaa"), 3), "mam": (list("mam"), 2)}
    ref_merges = []
    for rank in range(1, 3):
        from collections import Counter
        pc = Counter()
        for syms, f in words_py.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ref_merges.append((rank, l, r, l + r, cnt))
        for w, (syms, f) in words_py.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words_py[w] = (out, f)

    assert merges == ref_merges
    assert got == {w: syms for w, (syms, _f) in words_py.items()}
    # the specific stranding case: both 'ma's merged
    if ("m", "a") in {(m[1], m[2]) for m in merges}:
        assert got["mama"] == ["ma", "ma"]


def test_exhausted_vocabulary_matches_oracle(spark, tmp_path):
    """ADVICE r7: when the vocabulary fully merges before N_MERGES
    rounds, Spark's _train_merges breaks and keeps the last word
    frame, but the oracle's per-round rewrite CTE used to CROSS JOIN
    an EMPTY argmax round — erasing the word table and every encode
    row downstream. Run BOTH engines on a corpus that exhausts after
    two merges and demand the driver-style match for the training AND
    encode queries."""
    import duckdb

    from tests.duck_oracle import normalize

    docs_pq = tmp_path / "documents.parquet"
    # 'ab ab abc' exhausts: r1 merges (a,b), r2 merges (ab,c) - then
    # every word is a single symbol and rounds 3..N_MERGES are idle
    import pyarrow as pa

    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": ["ab ab abc", "ab abc"]}),
        docs_pq,
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs_pq}')"
    )
    for name in ("bpe_train_merges", "bpe_encode_corpus"):
        spec = get_spec(name)
        sdf = spec.fn(spark, str(tmp_path))
        s_rows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(spec.oracle)
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
        assert normalize(list(sdf.columns), s_rows) == normalize(
            d_cols, d_rows
        ), name
        if name == "bpe_train_merges":
            assert len(s_rows) == 2  # data-bounded stop, not N_MERGES
        else:
            assert len(s_rows) == 2  # one row per doc survives exhaustion


def test_driver_train_matches_distributed(spark, sf_dir):
    """The r13 driver-side training gate (one bounded limit-collect +
    local Python rounds) must be bit-identical to the distributed
    per-round aggregate/argmax loop it replaces below
    BPE_DRIVER_MAX_WORDS — the oracle replays the rounds CTE-for-CTE,
    so any drift is a certified-hash break. Checks both the merge
    table and the final (carried-word) frame."""
    import mapreduce_distributed_systems_spark.operators.bpe as bpe
    from mapreduce_distributed_systems_spark.sources import load_table

    wf = bpe._word_freqs(load_table(spark, sf_dir, "documents"))
    try:
        sym = bpe._symbolized(wf, carry_word=True)
        m_drv, f_drv = bpe._train_merges(sym, bpe.N_MERGES)
        old = bpe.BPE_DRIVER_MAX_WORDS
        bpe.BPE_DRIVER_MAX_WORDS = -1  # force the distributed loop
        try:
            m_dist, f_dist = bpe._train_merges(sym, bpe.N_MERGES)
        finally:
            bpe.BPE_DRIVER_MAX_WORDS = old
        assert m_drv == m_dist
        rows_drv = sorted(tuple(r) for r in f_drv.collect())
        rows_dist = sorted(tuple(r) for r in f_dist.collect())
        assert rows_drv == rows_dist
    finally:
        wf.unpersist()
