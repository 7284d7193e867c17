"""Streaming index maintenance x phrase support (r12): a production
index that serves phrase queries is maintained by the SAME streaming
append loop as the scoring postings, so the composition needs its own
pins — a stream-maintained index must keep its positional component,
its content must equal the batch append's (merge is associative, so
microbatch packing is invisible), and every streamed commit must keep
the positional relation in membership lockstep with the scoring
relation (the r12 CDC invariant, applied per streamed version)."""

from __future__ import annotations

import pytest

# driver-budget profile (pytest.ini): streamed positional lockstep replays (~26 s)
pytestmark = pytest.mark.slow

import tempfile

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.storage.lexical_index import (
    build_and_commit_bm25,
    append_bm25_index,
    index_version_diff,
    phrase_topk_from_index,
    read_bm25_index,
    read_positional_postings,
)
from mapreduce_distributed_systems_spark.streaming.index_stream import (
    BM25_STREAM_BASE,
    run_append_stream,
    stage_stream_source,
)


def _split_and_build(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    split = tempfile.mkdtemp(prefix="posstream_split_")
    docs.where(F.expr(BM25_STREAM_BASE)).write.mode("overwrite").parquet(
        f"{split}/documents.parquet"
    )
    base = tempfile.mkdtemp(prefix="posstream_idx_")
    build_and_commit_bm25(spark, split, base, with_positions=True)
    return docs, base


def test_streamed_index_keeps_phrase_support_and_matches_batch_append(
    spark, sf_dir
):
    """Base built WITH positions, odd half streamed in 2 microbatches:
    the final manifest must still carry the positional component, and
    the phrase top-k served from the streamed artifact must equal the
    one served from a single batch append of the same docs (the
    positional merge+re-prune is associative, so microbatch packing
    is content-invisible — same stats model on both sides)."""
    docs, base_s = _split_and_build(spark, sf_dir)
    new_docs = docs.where(~F.expr(BM25_STREAM_BASE))

    src = stage_stream_source(new_docs, n_files=2, prefix="posstream_src_")
    ckpt = tempfile.mkdtemp(prefix="posstream_ckpt_")
    run_append_stream(
        spark, src, new_docs.schema, base_s, ckpt, max_files_per_trigger=1
    )
    _post, _terms, _dl, m_s = read_bm25_index(spark, base_s)
    assert "positions_dir" in m_s, "stream append dropped phrase support"
    assert m_s["version"] == 3  # base + 2 microbatch commits

    # batch twin: one append of the identical doc set
    _docs2, base_b = _split_and_build(spark, sf_dir)
    append_bm25_index(spark, new_docs, base_b)
    _post, _terms, _dl, m_b = read_bm25_index(spark, base_b)

    served_s = {
        tuple(r)
        for r in phrase_topk_from_index(
            spark, sf_dir, read_positional_postings(spark, m_s), m_s
        ).collect()
    }
    served_b = {
        tuple(r)
        for r in phrase_topk_from_index(
            spark, sf_dir, read_positional_postings(spark, m_b), m_b
        ).collect()
    }
    assert served_s == served_b and len(served_s) > 0


def test_every_streamed_commit_keeps_positional_lockstep(spark, sf_dir):
    """For each consecutive streamed version pair, the CDC's
    pos_added/pos_removed rows must mirror added/removed exactly
    (same membership counts and tf mass) — the r12 batch invariant
    holds per microbatch commit, not just end-to-end."""
    docs, base = _split_and_build(spark, sf_dir)
    new_docs = docs.where(~F.expr(BM25_STREAM_BASE))
    src = stage_stream_source(new_docs, n_files=2, prefix="posstream2_src_")
    ckpt = tempfile.mkdtemp(prefix="posstream2_ckpt_")
    run_append_stream(
        spark, src, new_docs.schema, base, ckpt, max_files_per_trigger=1
    )
    for v_old, v_new in ((1, 2), (2, 3)):
        got = {
            r.change: (r.n_postings, r.n_terms, r.n_docs, r.sum_tf)
            for r in index_version_diff(spark, base, v_old, v_new).collect()
        }
        assert got["pos_added"] == got["added"], (v_old, v_new, got)
        assert got["pos_removed"] == got["removed"], (v_old, v_new, got)
        assert got["added"][0] > 0  # each microbatch really added rows
