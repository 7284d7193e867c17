"""A1 whole-file scan + A7 mr-out text sink parity
(mr/worker.go:166-173, 124-138)."""

from __future__ import annotations

import os
import tempfile

from mapreduce_distributed_systems_spark.operators.wordcount import word_count
from mapreduce_distributed_systems_spark.sources.text import (
    read_whole_text_files,
    write_mr_output,
)


def test_whole_file_scan_and_mr_output_roundtrip(spark):
    src = tempfile.mkdtemp(prefix="mr_text_src_")
    contents = {
        "pg-a.txt": "The quick brown fox. The fox!",
        "pg-b.txt": "fox and hound and fox",
    }
    for name, text in contents.items():
        with open(os.path.join(src, name), "w") as f:
            f.write(text)

    df = read_whole_text_files(spark, src + "/pg-*.txt")
    rows = {os.path.basename(r.filename): r.content for r in df.collect()}
    assert rows == contents  # whole-file contents, one row per file

    wc = word_count(df.selectExpr("content as text"))
    got = {(r.word, r.cnt) for r in wc.collect()}
    assert ("fox", 4) in got and ("The", 2) in got and ("and", 2) in got

    out = tempfile.mkdtemp(prefix="mr_text_out_") + "/mr-out"
    write_mr_output(wc, out, n_reduce=4, key_col="word", value_col="cnt")
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert len(parts) == 4  # ≙ nReduce output files
    assert "_SUCCESS" in os.listdir(out)
    lines = []
    for p in parts:
        with open(os.path.join(out, p)) as f:
            plines = [ln.rstrip("\n") for ln in f if ln.strip()]
            assert plines == sorted(plines)  # keys sorted within partition
            lines += plines
    parsed = {tuple(ln.split(" ")) for ln in lines}
    assert parsed == {(w, str(c)) for w, c in got}
