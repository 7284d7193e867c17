"""Smoke test for the scaling-probe generator (tools/scale_probe.py):
fact tables replicate N-fold with shifted keys, dims stay fixed, and
the shifted copies keep keys disjoint from the originals."""

from __future__ import annotations

import pytest

# driver-budget profile (pytest.ini): synthetic-scale probes
pytestmark = pytest.mark.slow

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


def test_zipf_skew_is_deterministic_and_heavy_headed(spark, sf_dir):
    tool = _load_tool()
    ev = load_table(spark, sf_dir, "events")
    skewed = tool.zipf_user_skew(ev)
    total = ev.count()
    # value-preserving: only user_id is remapped
    assert skewed.count() == total
    assert (
        skewed.agg(F.round(F.sum("value"), 2)).first()[0]
        == ev.agg(F.round(F.sum("value"), 2)).first()[0]
    )
    top = (
        skewed.groupBy("user_id")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .first()
    )
    # the hot user holds ~50% of all rows — a real straggler key
    assert top["user_id"] == 1
    assert top["count"] >= 0.45 * total
    # deterministic: same mapping on a second evaluation
    again = tool.zipf_user_skew(ev).groupBy("user_id").count()
    first = skewed.groupBy("user_id").count()
    assert first.exceptAll(again).count() == 0


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
