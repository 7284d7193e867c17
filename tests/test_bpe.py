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
