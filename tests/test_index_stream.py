"""Streaming lexical-index maintenance contracts (ROADMAP #23, staged
for r11 registration): frozen-stats oracle parity for the served
result, multi-batch == sequential-batch-append equivalence, and
kill-and-resume under the at-least-once foreachBatch sink."""

from __future__ import annotations

import pytest

# driver-budget profile (pytest.ini): streaming restart/redelivery replays (~40 s); content equivalence covered by test_lexical_index + parity
pytestmark = pytest.mark.slow

import glob
import json
import os
import tempfile
import time

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.sources import load_table
from mapreduce_distributed_systems_spark.storage.lexical_index import (
    append_bm25_index,
    build_and_commit_bm25,
    read_bm25_index,
)
from mapreduce_distributed_systems_spark.streaming.index_stream import (
    BM25_STREAM_BASE,
    STREAM_BM25_ORACLE,
    bm25_index_streaming_append,
    run_append_stream,
    stage_stream_source,
)
from tests.duck_oracle import compare_spark_vs_oracle


def _index_content(spark, base_dir, version=None):
    post, terms, dl, m = read_bm25_index(spark, base_dir, version=version)
    return (
        {(r.term, r.doc_id, r.tf, r.dl) for r in post.collect()},
        {(r.term, r.df) for r in terms.collect()},
        {(r.doc_id, r.dl) for r in dl.collect()},
        m,
    )


def test_stream_served_bm25_matches_frozen_stats_oracle(spark, sf_dir):
    """The compare the driver gate will run at r11: the full loop —
    base build, stream discovery, per-batch merge + re-prune, manifest
    swaps, stored-stats scoring — against the frozen-stats BM25 SQL."""
    df = bm25_index_streaming_append(spark, sf_dir)
    compare_spark_vs_oracle(df, STREAM_BM25_ORACLE, sf_dir)


def test_multibatch_stream_equals_sequential_batch_appends(spark, sf_dir):
    """Three single-file microbatches through the stream must commit
    exactly the index a batch job appending the same three files in
    the same order commits — postings, dictionary, and doc lengths
    all content-equal, versions counting up from the base build."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split_dir = tempfile.mkdtemp(prefix="idxstream_split_")
    docs.where(F.expr(BM25_STREAM_BASE)).write.mode("overwrite").parquet(
        f"{split_dir}/documents.parquet"
    )
    new_docs = docs.where(~F.expr(BM25_STREAM_BASE))
    src = stage_stream_source(new_docs, n_files=3)

    streamed = tempfile.mkdtemp(prefix="idxstream_s_")
    build_and_commit_bm25(spark, split_dir, streamed)
    ckpt = tempfile.mkdtemp(prefix="idxstream_ckpt_")
    run_append_stream(
        spark, src, new_docs.schema, streamed, ckpt, max_files_per_trigger=1
    )

    batch = tempfile.mkdtemp(prefix="idxstream_b_")
    build_and_commit_bm25(spark, split_dir, batch)
    for j in range(3):
        append_bm25_index(
            spark, spark.read.parquet(f"{src}/part-{j}.parquet"), batch
        )

    s_post, s_terms, s_dl, s_m = _index_content(spark, streamed)
    b_post, b_terms, b_dl, b_m = _index_content(spark, batch)
    assert s_m["version"] == b_m["version"] == 4  # base + 3 appends
    assert s_post == b_post
    assert s_terms == b_terms
    assert s_dl == b_dl
    assert s_m["stale_stats"] is True
    assert (s_m["n_docs"], s_m["avgdl"]) == (b_m["n_docs"], b_m["avgdl"])


def _plant_corpus(spark):
    """Base corpus introduces EVERY term; streamed docs only reuse
    them. That makes the final index content invariant to how the
    engine packs files into batches on restart (new-term df is the
    one packing-dependent quantity, by the documented frozen-df
    rule), so the restart test can assert exact content equality."""
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    base_rows = [
        (i, " ".join(vocab[(i + j) % len(vocab)] for j in range(4)))
        for i in range(0, 20, 2)
    ]
    new_rows = [
        (i, " ".join(vocab[(i * 3 + j) % len(vocab)] for j in range(5)))
        for i in range(1, 41, 2)
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    return base, new


def test_restart_redelivery_preserves_index_content(spark):
    """Kill the stream mid-run, restart from the same checkpoint:
    foreachBatch may redeliver an interrupted batch, and the append's
    doc-id anti-join must absorb it — the final index content equals
    a clean uninterrupted run's, whatever the restart's packing or
    version count (exactly-once CONTENT over an at-least-once sink)."""
    base, new = _plant_corpus(spark)
    split_dir = tempfile.mkdtemp(prefix="idxrestart_split_")
    base.write.mode("overwrite").parquet(f"{split_dir}/documents.parquet")
    src = stage_stream_source(new, n_files=4)

    # clean reference run (fresh checkpoint, drains everything)
    clean = tempfile.mkdtemp(prefix="idxrestart_clean_")
    build_and_commit_bm25(spark, split_dir, clean)
    run_append_stream(
        spark,
        src,
        new.schema,
        clean,
        tempfile.mkdtemp(prefix="idxrestart_ckpt1_"),
        max_files_per_trigger=1,
    )

    # interrupted run: stop as soon as >=1 append committed, then
    # resume on the SAME checkpoint
    killed = tempfile.mkdtemp(prefix="idxrestart_killed_")
    build_and_commit_bm25(spark, split_dir, killed)
    ckpt = tempfile.mkdtemp(prefix="idxrestart_ckpt2_")

    reader = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", 1
    )
    stream = reader.parquet(src).select("doc_id", "text")

    def _append(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        append_bm25_index(spark, batch_df, killed)

    q1 = (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if len(glob.glob(os.path.join(killed, "manifest-0*.json"))) >= 2:
            break  # base + at least one streamed append landed
        if q1.exception() is not None:
            raise q1.exception()
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination()
    with open(os.path.join(killed, "manifest.json")) as f:
        v_after_kill = json.load(f)["version"]
    assert v_after_kill >= 2, "stream made no progress before stop"

    run_append_stream(
        spark, src, new.schema, killed, ckpt, max_files_per_trigger=1
    )

    c_post, c_terms, c_dl, c_m = _index_content(spark, clean)
    k_post, k_terms, k_dl, k_m = _index_content(spark, killed)
    assert k_post == c_post
    assert k_terms == c_terms
    assert k_dl == c_dl
    # a redelivered batch may add an extra (content-identical) version
    assert k_m["version"] >= c_m["version"]
    # every streamed doc is retrievable exactly once in the doclens
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    assert {d for d, _ in k_dl} >= new_ids
