"""Margin-criterion pair mining beyond oracle parity: the margin
property itself, a pure-numpy third-engine re-derivation, and the
scan-shape pin (corpus never shuffled)."""

from __future__ import annotations

from mapreduce_distributed_systems_spark.plans.registry import get_spec


def _brute_mine(sf_dir: str):
    """Pure-numpy/pyarrow re-derivation of the full pipeline — an
    implementation with NO shared code with either engine."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduce_distributed_systems_spark.operators.bitext import (
        ANCHOR_CAP,
        KNN_K,
        MARGIN_SCALED,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"], dtype=np.int64)
    lab = np.array(t["label"], dtype=np.int64)
    v = np.array([list(map(float, e)) for e in t["embedding"]])
    a_m, b_m = lab % 2 == 0, lab % 2 == 1

    import math

    def half_away(x):
        # Spark F.round and DuckDB round() are half-AWAY-from-zero;
        # Python round() is banker's (half-to-even), which would make
        # this re-derivation disagree with BOTH engines on an exact
        # .5 boundary (ADVICE r8). Cosines can be negative, so mirror
        # around zero explicitly.
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    def cos6(x, y):
        c = (x @ y) / (np.linalg.norm(x) * np.linalg.norm(y))
        return half_away(c * 1e6)

    def knn(qid, qv, side_ids, side_v, k):
        scored = sorted(
            (
                (-cos6(qv, side_v[i]), int(side_ids[i]))
                for i in range(len(side_ids))
                if side_ids[i] != qid
            ),
        )[:k]
        return [(-s, i) for s, i in scored]

    anchors = sorted(int(i) for i in ids[a_m] if i % 20 == 0)[:ANCHOR_CAP]
    by_id = {int(i): v[j] for j, i in enumerate(ids)}
    out = {}
    for aid in anchors:
        nn = knn(aid, by_id[aid], ids[b_m], v[b_m], KNN_K)
        best_cos, best_id = nn[0]
        sum_x, n_x = sum(c for c, _ in nn), len(nn)
        nny = knn(best_id, by_id[best_id], ids[a_m], v[a_m], KNN_K)
        sum_y, n_y = sum(c for c, _ in nny), len(nny)
        margin6 = half_away(best_cos * 1e6 / (0.5 * (sum_x / n_x + sum_y / n_y)))
        if margin6 >= MARGIN_SCALED:
            out[aid] = (best_id, best_cos, margin6)
    return out


def test_bitext_matches_pure_python_rederivation(spark, sf_dir):
    got = {
        r.anchor_id: (r.pair_id, r.cos6, r.margin6)
        for r in get_spec("bitext_margin_mine").fn(spark, sf_dir).collect()
    }
    assert got == _brute_mine(sf_dir)
    assert got, "margin filter kept nothing — fixture no longer exercises it"


def test_bitext_margin_semantics(spark, sf_dir):
    """Every kept pair crosses sides, clears the threshold, and its
    cos6 can never exceed 1e6 + rounding; dropped anchors exist so the
    filter is non-vacuous."""
    import duckdb

    from mapreduce_distributed_systems_spark.operators.bitext import (
        ANCHOR_FILTER,
        MARGIN_SCALED,
    )

    rows = get_spec("bitext_margin_mine").fn(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    lab = dict(
        con.execute("SELECT vec_id, label FROM embeddings").fetchall()
    )
    n_anchor = con.execute(
        f"SELECT count(*) FROM embeddings WHERE label % 2 = 0 AND {ANCHOR_FILTER}"
    ).fetchone()[0]
    for r in rows:
        assert lab[r.anchor_id] % 2 == 0 and lab[r.pair_id] % 2 == 1
        assert r.margin6 >= MARGIN_SCALED
        assert r.cos6 <= 1_000_001
    assert len(rows) < n_anchor, "no anchor was filtered — vacuous threshold"


def test_bitext_scan_never_shuffles_corpus(spark, sf_dir):
    """Both scans are mapInPandas over an un-shuffled side; the only
    exchanges carry O(anchors x k) scored rows into the rank windows
    and the bounded broadcast join."""
    df = get_spec("bitext_margin_mine").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in keys, keys  # vectors never shuffle
    assert "BroadcastExchange" in plan  # the bounded ky side broadcasts


# --------------------------------------------------------------------------
# DSIR importance selection (same round-8 batch; shares this module's
# "mining/selection beyond parity" scope)
# --------------------------------------------------------------------------


def test_dsir_planted_domain_is_selected(spark):
    """Plant a target domain with its own vocabulary: 'en' docs use
    vocab A; half the 'xx' docs are A-lookalikes, half use a disjoint
    vocab B. The importance selection must rank every lookalike above
    every B doc."""
    from mapreduce_distributed_systems_spark.operators.sampling import (
        dsir_select,
    )

    va = ["alpha", "bravo", "casa", "delta", "echo"]
    vb = ["zulu", "yankee", "xray", "wiski", "viktor"]
    rows = []
    did = 0
    for _ in range(10):  # target domain
        rows.append((did, "en", " ".join(va * 4))); did += 1
    look, other = [], []
    for i in range(10):  # raw pool: lookalikes
        rows.append((did, "xx", " ".join(va * 3))); look.append(did); did += 1
    for i in range(10):  # raw pool: out-of-domain
        rows.append((did, "xx", " ".join(vb * 3))); other.append(did); did += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = {
        r.doc_id
        for r in dsir_select(docs, target_lang="en", keep=20).collect()
    }
    assert set(look) <= kept, "A-lookalikes must all be selected"
    assert not (set(other) & kept), "out-of-domain B docs must all rank below"


def test_dsir_plan_shape(spark, sf_dir):
    """Selection is TakeOrdered (never a full sort), the bucket-weight
    table broadcasts (never shuffles the token stream on b), and no
    exchange carries document text."""
    import re

    df = get_spec("dsir_importance_select").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in keys, keys


def test_dsir_gumbel_resample_is_weight_biased_not_topn(spark, sf_dir):
    """The Gumbel resample must (a) be a distinct-doc sample of
    exactly DSIR_KEEP, (b) differ from the deterministic top-N
    selection (the noise resamples the tail, not just reorders), and
    (c) remain importance-BIASED: the sample's overlap with the top-N
    set stays well above the uniform-sampling expectation."""
    import duckdb

    from mapreduce_distributed_systems_spark.operators.sampling import (
        DSIR_KEEP,
    )

    sel = {
        r.doc_id
        for r in get_spec("dsir_importance_select").fn(spark, sf_dir).collect()
    }
    sam_rows = get_spec("dsir_gumbel_resample").fn(spark, sf_dir).collect()
    sam = {r.doc_id for r in sam_rows}
    assert len(sam_rows) == DSIR_KEEP and len(sam) == DSIR_KEEP
    assert sam != sel, "noise did nothing — this is just top-N again"
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    uniform_expect = DSIR_KEEP * DSIR_KEEP / n_docs
    overlap = len(sam & sel)
    assert overlap > 2 * uniform_expect, (overlap, uniform_expect)
