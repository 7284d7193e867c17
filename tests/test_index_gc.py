"""Lexical-index version retention / GC (staged r12 maintenance op,
storage/lexical_index.py gc_bm25_index): bytes reclaimed, retained
versions byte-identical in content, fail-loudly tombstones, live
pointer immunity, idempotence."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.sources import load_table
from mapreduce_distributed_systems_spark.storage.lexical_index import (
    append_bm25_index,
    build_and_commit_bm25,
    bm25_topk_from_index,
    gc_bm25_index,
    read_bm25_index,
)


def _three_version_chain(spark, sf_dir):
    """v1 = even doc_ids, v2 = +half the odds, v3 = +the rest."""
    base = tempfile.mkdtemp(prefix="bm25_gc_")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = tempfile.mkdtemp(prefix="bm25_gc_split_")
    docs.where(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        f"{split}/documents.parquet"
    )
    build_and_commit_bm25(spark, split, base)
    append_bm25_index(spark, docs.where(F.col("doc_id") % 4 == 1), base)
    append_bm25_index(spark, docs.where(F.col("doc_id") % 4 == 3), base)
    return base


def test_gc_reclaims_old_versions_and_preserves_serving(spark, sf_dir):
    base = _three_version_chain(spark, sf_dir)
    post, terms, _dl, manifest = read_bm25_index(spark, base)
    served_before = sorted(
        tuple(r)
        for r in bm25_topk_from_index(
            spark, sf_dir, post, terms, manifest
        ).collect()
    )
    v1_post_dir = json.load(open(os.path.join(base, "manifest-001.json")))[
        "postings_dir"
    ]
    assert os.path.exists(v1_post_dir)

    summary = gc_bm25_index(base, keep_latest=2)
    assert summary["collected"] == [1]
    assert summary["kept"] == [2, 3]
    assert summary["reclaimed_bytes"] > 0
    assert not os.path.exists(v1_post_dir)
    # the commit record survives as history even though the bytes are
    # gone
    assert os.path.exists(os.path.join(base, "manifest-001.json"))

    # retained versions are untouched: the serve path returns the
    # exact same ranking
    post, terms, _dl, manifest = read_bm25_index(spark, base)
    served_after = sorted(
        tuple(r)
        for r in bm25_topk_from_index(
            spark, sf_dir, post, terms, manifest
        ).collect()
    )
    assert served_after == served_before
    # the retained pinned version still resolves
    post2, _, _, m2 = read_bm25_index(spark, base, version=2)
    assert m2["version"] == 2 and post2.count() > 0


def test_pinned_read_of_collected_version_fails_loudly(spark, sf_dir):
    base = _three_version_chain(spark, sf_dir)
    gc_bm25_index(base, keep_latest=2)
    with pytest.raises(RuntimeError, match="garbage-collected"):
        read_bm25_index(spark, base, version=1)


def test_gc_is_idempotent(spark, sf_dir):
    base = _three_version_chain(spark, sf_dir)
    first = gc_bm25_index(base, keep_latest=2)
    second = gc_bm25_index(base, keep_latest=2)
    assert first["collected"] == [1]
    assert second["collected"] == []
    assert second["reclaimed_bytes"] == 0
    # ledger still carries the v1 record
    ledger = json.load(open(os.path.join(base, "gc.json")))
    assert "1" in ledger and ledger["1"]["reclaimed_bytes"] > 0


def test_gc_crash_between_tombstone_and_delete_stays_loud(
    spark, sf_dir, monkeypatch
):
    """ADVICE r10: the ledger entry must be committed BEFORE the
    version's directories are removed. Simulate a crash exactly
    between the two: the tombstone must already be on disk (so a
    pinned read fails with the loud RuntimeError, not a raw parquet
    path error), and a rerun must finish the interrupted deletion."""
    import mapreduce_distributed_systems_spark.storage.lexical_index as li

    base = _three_version_chain(spark, sf_dir)
    v1_post_dir = json.load(open(os.path.join(base, "manifest-001.json")))[
        "postings_dir"
    ]

    def crash_rmtree(path, *a, **k):
        raise OSError("injected crash before any bytes are removed")

    monkeypatch.setattr(li.shutil, "rmtree", crash_rmtree)
    with pytest.raises(OSError, match="injected crash"):
        gc_bm25_index(base, keep_latest=2)
    monkeypatch.undo()

    # tombstone landed first: the gate is loud even though the bytes
    # are still on disk — and NOT yet marked swept, so the ledger
    # records deletion-in-flight honestly (ADVICE r11)
    ledger = json.load(open(os.path.join(base, "gc.json")))
    assert "1" in ledger
    assert not ledger["1"].get("swept")
    assert os.path.exists(v1_post_dir)
    with pytest.raises(RuntimeError, match="garbage-collected"):
        read_bm25_index(spark, base, version=1)

    # rerun converges: finishes the sweep without re-reporting v1,
    # and marks the tombstone swept now that the bytes are gone
    summary = gc_bm25_index(base, keep_latest=2)
    assert summary["collected"] == []
    assert summary["reclaimed_bytes"] > 0
    assert not os.path.exists(v1_post_dir)
    ledger = json.load(open(os.path.join(base, "gc.json")))
    assert ledger["1"]["swept"] is True
    # and a further run is a true no-op
    again = gc_bm25_index(base, keep_latest=2)
    assert again["collected"] == [] and again["reclaimed_bytes"] == 0


def test_gc_crash_after_delete_converges_to_swept(spark, sf_dir):
    """ADVICE r12 #3: a crash between shutil.rmtree and the final
    ledger write leaves a tombstone whose bytes are gone but whose
    swept marker is unset. The resume path must upgrade it to
    swept=True (and persist that) rather than bare-continue, so the
    'bytes verifiably gone' terminal state is reachable and future
    GCs stop re-opening the version's manifest."""
    base = _three_version_chain(spark, sf_dir)
    gc_bm25_index(base, keep_latest=2)
    ledger_path = os.path.join(base, "gc.json")
    ledger = json.load(open(ledger_path))
    assert ledger["1"]["swept"] is True
    # manufacture the crash state: bytes already gone, marker lost
    del ledger["1"]["swept"]
    with open(ledger_path, "w") as f:
        json.dump(ledger, f)

    summary = gc_bm25_index(base, keep_latest=2)
    assert summary["collected"] == [] and summary["reclaimed_bytes"] == 0
    ledger = json.load(open(ledger_path))
    assert ledger["1"]["swept"] is True, (
        "resume path must persist the terminal swept state"
    )


def test_gc_never_touches_the_live_version(spark, sf_dir):
    """Even keep_latest=1 must keep the version manifest.json points
    at — the live pointer is immune by construction, not by luck."""
    base = _three_version_chain(spark, sf_dir)
    summary = gc_bm25_index(base, keep_latest=1)
    assert summary["collected"] == [1, 2]
    assert summary["kept"] == [3]
    post, terms, _dl, manifest = read_bm25_index(spark, base)
    served = bm25_topk_from_index(spark, sf_dir, post, terms, manifest)
    assert served.count() > 0


def test_gc_rejects_zero_retention(spark, sf_dir):
    base = _three_version_chain(spark, sf_dir)
    with pytest.raises(ValueError):
        gc_bm25_index(base, keep_latest=0)


def test_post_gc_serve_matches_bm25_oracle(spark, sf_dir):
    """The staged r12 query doc_bm25_serve_post_gc: rebuild-chain ->
    GC to retention 1 -> serve must equal the exact BM25 SQL — the
    same compare the driver gate would run at registration."""
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        BM25_ORACLE,
    )
    from mapreduce_distributed_systems_spark.storage.lexical_index import (
        doc_bm25_serve_post_gc,
    )
    from tests.duck_oracle import compare_spark_vs_oracle

    df = doc_bm25_serve_post_gc(spark, sf_dir)
    compare_spark_vs_oracle(df, BM25_ORACLE, sf_dir)


@pytest.mark.slow  # driver-budget profile, see pytest.ini
def test_gc_after_streaming_appends_preserves_head_content(spark, sf_dir):
    """The realistic 24/7 ops sequence: base build -> streamed
    microbatch appends (version per batch) -> retention GC. The
    surviving head must be content-identical to the pre-GC head, old
    versions' bytes gone, and a pinned read of a collected version
    must fail loudly — the full maintenance loop in one test."""
    import tempfile

    from mapreduce_distributed_systems_spark.storage.lexical_index import (
        build_and_commit_bm25,
    )
    from mapreduce_distributed_systems_spark.streaming.index_stream import (
        BM25_STREAM_BASE,
        run_append_stream,
        stage_stream_source,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split_dir = tempfile.mkdtemp(prefix="idxgc_split_")
    docs.where(F.expr(BM25_STREAM_BASE)).write.mode("overwrite").parquet(
        f"{split_dir}/documents.parquet"
    )
    new_docs = docs.where(~F.expr(BM25_STREAM_BASE))
    src = stage_stream_source(new_docs, n_files=3)

    base = tempfile.mkdtemp(prefix="idxgc_idx_")
    build_and_commit_bm25(spark, split_dir, base)
    ckpt = tempfile.mkdtemp(prefix="idxgc_ckpt_")
    run_append_stream(
        spark, src, new_docs.schema, base, ckpt, max_files_per_trigger=1
    )

    post, terms, _dl, manifest = read_bm25_index(spark, base)
    assert manifest["version"] == 4  # base + 3 streamed appends
    head_before = sorted(
        tuple(r)
        for r in post.select("term", "doc_id", "tf", "dl").collect()
    )

    summary = gc_bm25_index(base, keep_latest=1)
    assert summary["collected"] == [1, 2, 3]
    post_after, _, _, m_after = read_bm25_index(spark, base)
    assert m_after["version"] == 4
    head_after = sorted(
        tuple(r)
        for r in post_after.select("term", "doc_id", "tf", "dl").collect()
    )
    assert head_after == head_before
    with pytest.raises(RuntimeError, match="garbage-collected"):
        read_bm25_index(spark, base, version=2)
