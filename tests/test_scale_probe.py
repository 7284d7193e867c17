"""Smoke test for the scaling-probe generator (tools/scale_probe.py):
fact tables replicate N-fold with shifted keys, dims stay fixed, and
the shifted copies keep keys disjoint from the originals."""

from __future__ import annotations

import importlib.util
import os
import tempfile

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.sources import load_table


def _load_tool():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(root, "tools", "scale_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaled_copy_shifts_keys_and_varies_text(spark, sf_dir):
    tool = _load_tool()
    docs = load_table(spark, sf_dir, "documents")
    copy1 = tool.scaled_copy(docs, "documents", 1)
    base_max = docs.agg(F.max("doc_id")).first()[0]
    copy_min = copy1.agg(F.min("doc_id")).first()[0]
    assert copy_min > base_max, "shifted copy keys must be disjoint"
    # text varies per copy so dup structure grows linearly
    assert copy1.where(F.col("text").endswith("copyvariant1")).count() == docs.count()


def test_probe_output_scales_facts_not_dims(spark, sf_dir):
    tool = _load_tool()
    dest = tempfile.mkdtemp(prefix="probe_test_")
    import sys

    argv = sys.argv
    sys.argv = ["scale_probe", "--mult", "2", "--src", sf_dir, "--dest", dest]
    try:
        tool.main()
    finally:
        sys.argv = argv
    for name in ("region", "nation"):
        assert (
            spark.read.parquet(f"{dest}/{name}.parquet").count()
            == load_table(spark, sf_dir, name).count()
        )
    for name in ("events", "documents"):
        assert (
            spark.read.parquet(f"{dest}/{name}.parquet").count()
            == 2 * load_table(spark, sf_dir, name).count()
        )
