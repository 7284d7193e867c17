"""Similarity-search behavior beyond oracle parity: LSH recall vs the
brute-force baseline, and the multimodal codec-stub contract."""

from __future__ import annotations

import pytest

from mapreduce_distributed_systems_spark.operators.multimodal import (
    decode_audio,
    decode_image,
)
from mapreduce_distributed_systems_spark.plans.registry import get_spec


def test_lsh_recall_floor(spark, sf_dir):
    brute = {
        (r.query_id, r.neighbor_id)
        for r in get_spec("ann_cosine_topk").fn(spark, sf_dir).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in get_spec("ann_lsh_bucketed").fn(spark, sf_dir).collect()
    }
    recall = len(brute & lsh) / len(brute)
    # weakly-similar random vectors: 6x4-bit RH-LSH lands ~0.45;
    # the floor guards against silent signature/band regressions
    assert recall >= 0.3, f"LSH recall collapsed: {recall:.2f}"


def test_lsh_banding_formula_bounds_occupancy():
    """The corpus-scaled banding lever (lsh_bits_for): expected
    band-bucket occupancy corpus/2^bits must stay <= the target at
    every corpus size above the 4-bit floor's boundary, through
    100 TB-scale cardinalities."""
    from mapreduce_distributed_systems_spark.operators.similarity import (
        LSH_MIN_BITS,
        LSH_TARGET_OCCUPANCY,
        lsh_bits_for,
    )

    assert lsh_bits_for(500) == LSH_MIN_BITS  # driver SFs keep the default
    assert lsh_bits_for(2000) == LSH_MIN_BITS  # bench SF keeps the default
    for n in (2_048, 20_000, 200_000, 2_000_000, 10**9, 10**11):
        bits = lsh_bits_for(n)
        assert n / 2**bits <= LSH_TARGET_OCCUPANCY, (n, bits)
    # monotone: a bigger corpus never gets fewer bits
    sizes = [10**k for k in range(2, 12)]
    bit_seq = [lsh_bits_for(n) for n in sizes]
    assert bit_seq == sorted(bit_seq)


def _perturbed_10x_corpus(spark, sf_dir):
    """The shared 10x growth fixture for the banding-lever tests: 9
    per-copy-perturbed clones of the embeddings table (one component
    shifted by i*0.37 so vectors are distinct, as real growth would
    be — pure key-shifted clones would share signatures and trivially
    saturate any banding). Copy i lives at vec_id + i*100_000_000."""
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    copies = emb
    for i in range(1, 10):
        copies = copies.unionByName(
            emb.select(
                (F.col("vec_id") + 100_000_000 * i).alias("vec_id"),
                F.expr(
                    f"transform(v, (x, j) -> CASE WHEN j = {i % 64} "
                    f"THEN x + {i} * 0.37d ELSE x END)"
                ).alias("v"),
            )
        )
    return emb, copies


def test_lsh_occupancy_bounded_under_10x(spark, sf_dir):
    """Empirical twin of the formula test: on a 10x synthetic corpus
    (per-copy perturbed so vectors are distinct, as real growth would
    be), the engaged lever must hold MEAN bucket occupancy at or under
    the target, strictly below what the fixed 4-bit config yields."""
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.operators.similarity import (
        LSH_TARGET_OCCUPANCY,
        N_BANDS,
        lsh_bits_for,
        rh_band_keys,
    )

    _, copies = _perturbed_10x_corpus(spark, sf_dir)
    n = copies.count()
    bits = lsh_bits_for(n)
    assert bits > lsh_bits_for(n // 10), "10x growth should engage the lever"
    occ = (
        rh_band_keys(copies, N_BANDS, bits)
        .groupBy("k", "bkey")
        .agg(F.count("*").alias("n"))
        .agg(F.avg("n").alias("mean_occ"))
        .collect()[0]["mean_occ"]
    )
    assert occ <= LSH_TARGET_OCCUPANCY, f"mean occupancy {occ:.1f}"
    fixed_occ = n / 2**4  # what the un-scaled 4-bit config would average
    assert occ < fixed_occ


def test_lsh_recall_floor_under_10x(spark, sf_dir):
    """Recall twin of the occupancy test — the band-growth story needs
    measured recall NEXT TO measured occupancy: every extra bit per
    band lowers a true neighbor's per-band collision probability
    ((1-theta/pi)^bits), so a lever that only bounded occupancy could
    silently trade away the recall the dedup path depends on.

    Ground truth is planted by the same 10x fixture: copy 1 shifts one
    component by 0.37 on a unit-norm vector, so each (orig, copy1)
    pair sits at cosine ~0.91-0.96 — the near-dup tier
    dedup_embedding_cosine targets. With the lever engaged (6 bits at
    ~5.5k vs the 4-bit floor), RH-LSH theory puts any-of-6-band
    collision for that tier at >=0.95; the floor at 0.75 guards
    against collapse while leaving room for plane-sampling variance.
    Pairs are conditioned on MEASURED cosine >= 0.9 so the property is
    exact, not an artifact of the perturbation's tail."""
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.operators.similarity import (
        N_BANDS,
        lsh_bits_for,
        rh_band_keys,
    )

    emb, copies = _perturbed_10x_corpus(spark, sf_dir)
    n = copies.count()
    bits = lsh_bits_for(n)
    assert bits > lsh_bits_for(n // 10), "10x growth should engage the lever"

    # measured cosine of each planted (orig, copy1) pair: unit-norm
    # originals, so cos = (1 + 0.37*v[1]) / sqrt(1 + 0.74*v[1] + 0.37^2)
    truth = (
        emb.select(
            "vec_id",
            F.expr(
                "(1.0d + 0.37d * v[1]) / "
                "sqrt(1.0d + 0.74d * v[1] + 0.1369d)"
            ).alias("cos"),
        )
        .where(F.col("cos") >= 0.9)
    )
    n_truth = truth.count()
    assert n_truth > 0

    keys = rh_band_keys(copies, N_BANDS, bits)
    ka = keys.where(F.col("vec_id") < 100_000_000)
    kb = keys.where(
        (F.col("vec_id") >= 100_000_000) & (F.col("vec_id") < 200_000_000)
    ).select(
        (F.col("vec_id") - 100_000_000).alias("vec_id"),
        F.col("k"),
        F.col("bkey"),
    )
    matched = (
        ka.join(kb, ["vec_id", "k", "bkey"]).select("vec_id").distinct()
    )
    hit = matched.join(truth, "vec_id").count()
    recall = hit / n_truth
    assert recall >= 0.75, (
        f"banding-lever recall collapsed: {recall:.3f} over {n_truth} "
        f"planted near-dup pairs at bits={bits}"
    )


def test_ivf_cell_formula_bounds_cell_size():
    """The IVF cell-count lever (ivf_k_for): expected cell size
    corpus/k must stay <= the target at every corpus size above the
    k=8 floor's boundary — pair work per vector is then constant."""
    from mapreduce_distributed_systems_spark.operators.similarity import (
        IVF_KMEANS_K,
        IVF_TARGET_CELL,
        ivf_k_for,
    )

    assert ivf_k_for(500) == IVF_KMEANS_K  # driver SFs keep the default
    assert ivf_k_for(2000) == IVF_KMEANS_K  # bench SF keeps the default
    for n in (20_000, 60_000, 1_000_000, 10**9):
        k = ivf_k_for(n)
        assert n / k <= IVF_TARGET_CELL, (n, k)
    sizes = [10**e for e in range(2, 10)]
    ks = [ivf_k_for(n) for n in sizes]
    assert ks == sorted(ks)


def test_decode_stubs_raise_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")
    with pytest.raises(NotImplementedError):
        decode_audio(b"abc")


def test_fake_decode_deterministic():
    a = decode_image(b"hello world", fake=True)
    b = decode_image(b"hello world", fake=True)
    assert a == b
    assert a["n_bytes"] == 11
    assert 1 <= a["width"] <= 64 and 1 <= a["height"] <= 64


def test_ivf_kmeans_recall_floor(spark, sf_dir):
    """IVF over REAL k-means cells must beat the RH-LSH recall floor:
    the learned quantizer routes queries to the cells that actually
    hold their neighbors (~0.76 measured at sf0.01, probe 3 of 8)."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in get_spec("ann_cosine_topk").fn(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in get_spec("ann_ivf_kmeans").fn(spark, sf_dir).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"k-means IVF recall collapsed: {recall:.2f}"


def test_int8_quantized_recall(spark, sf_dir):
    """int8 cosine must agree with the float baseline almost exactly —
    quantization noise at 64 dims costs at most a tail neighbor
    (1.0 measured at sf0.001/sf0.01)."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in get_spec("ann_cosine_topk").fn(spark, sf_dir).collect()
    }
    q8 = {
        (r.query_id, r.neighbor_id)
        for r in get_spec("ann_cosine_int8").fn(spark, sf_dir).collect()
    }
    recall = len(brute & q8) / len(brute)
    assert recall >= 0.9, f"int8 recall collapsed: {recall:.2f}"


def test_hard_negatives_exclude_the_near_dup_band(spark, sf_dir):
    """The ceiling branch must be non-vacuous: every query has a
    PLANTED exact duplicate (cosine 1.0) that plain top-k would rank
    first — no result row may carry it, or any score above the
    ceiling, and the rank-1 negative must differ from top-k's rank-1
    wherever the duplicate would have won."""
    from mapreduce_distributed_systems_spark.operators.similarity import (
        HARD_NEG_CEILING,
    )
    from mapreduce_distributed_systems_spark.plans.registry import get_spec
    from mapreduce_distributed_systems_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = get_spec("ann_hard_negatives").fn(spark, sf_dir).collect()
    assert rows
    emb = load_table(spark, sf_dir, "embeddings")
    shift = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    for r in rows:
        assert r.cos_sim <= HARD_NEG_CEILING, (r.query_id, r.cos_sim)
        assert r.neighbor_id < shift or r.neighbor_id - shift != r.query_id
    # the planted duplicate never appears as anyone's negative
    planted = {r.neighbor_id for r in rows if r.neighbor_id >= shift}
    queries = {r.query_id for r in rows}
    assert not {p - shift for p in planted} & queries


# --------------------------------------------------------------------------
# Round-8 (VERDICT r7 "What's wrong #2"): the brute-force kernels keep a
# per-partition top-k per query instead of emitting every (query,
# neighbor, score) triple. Two guarantees to pin: (a) the prune is
# LOSSLESS under the final rounded (cos DESC, id ASC) order even on
# adversarial tie/boundary inputs, and (b) the rank window's input is
# O(k x n_partitions) per query, never corpus-sized.
# --------------------------------------------------------------------------


def _rounded_topk(ids, s, k, ceiling=None):
    """Ground truth: full rounded-order ranking of one query column."""
    import numpy as np

    r = np.round(s, 6)
    elig = np.isfinite(s) if ceiling is None else (np.isfinite(s) & (r <= ceiling))
    order = sorted(
        (int(i) for i in np.nonzero(elig)[0]),
        key=lambda i: (-r[i], ids[i]),
    )
    return [ids[i] for i in order[:k]]


@pytest.mark.parametrize("ceiling", [None, 0.95])
def test_prune_mask_lossless_under_rounded_order(ceiling):
    """Adversarial kernel test: scores engineered with exact ties,
    sub-1e-7 near-ties, and values straddling the ceiling boundary,
    scored in several 'partitions' of several 'batches'. The union of
    each partition's pruned survivors must contain the true global
    rounded-order top-k for every query, and each partition must emit
    a bounded number of rows per query."""
    import numpy as np

    from mapreduce_distributed_systems_spark.operators.similarity import (
        _ROUND_MARGIN,
        _consolidate_mask,
        _prune_mask,
    )

    rng = np.random.RandomState(8)
    k = 5
    n, q = 400, 7
    s = rng.uniform(-1, 1, size=(n, q))
    # exact ties: blocks of identical scores near the top
    s[:40] = np.round(rng.uniform(0.9, 1.0, size=(1, q)), 6)
    # near-ties one rounding-step apart around a common value
    s[40:80] = 0.8765435 + rng.choice(
        [-1.5e-7, -0.5e-7, 0.0, 0.5e-7, 1.5e-7], size=(40, q)
    )
    if ceiling is not None:
        # straddle the ceiling: raw values whose rounding decides
        s[80:120] = ceiling + rng.choice(
            [-1.2e-6, -4e-7, 0.0, 4e-7, 1.2e-6], size=(40, q)
        )
    ids = rng.permutation(n).astype(np.int64)
    q_ids = np.arange(q, dtype=np.int64)

    survivors: list[tuple[int, int]] = []  # (query, neighbor) pairs kept
    for part in np.array_split(np.arange(n), 4):  # 4 "partitions"
        cq, cn, cs = [], [], []
        for batch in np.array_split(part, 3):  # 3 Arrow "batches" each
            sb = s[batch].copy()
            if ceiling is not None:
                maybe = (sb > ceiling - _ROUND_MARGIN) & (
                    sb <= ceiling + _ROUND_MARGIN
                )
                sd = np.where(sb <= ceiling - _ROUND_MARGIN, sb, -np.inf)
                mask = _prune_mask(sd, k) | maybe
            else:
                mask = _prune_mask(sb, k)
            ni, qi = np.nonzero(mask)
            cq.append(q_ids[qi])
            cn.append(ids[batch][ni])
            cs.append(sb[ni, qi])
        qa, na, sa = map(np.concatenate, (cq, cn, cs))
        keep = _consolidate_mask(qa, sa, q_ids, k, ceiling=ceiling)
        # bound (b): ~k rows per query per partition (+ tie/boundary band)
        for j in range(q):
            per_q = int((qa[keep] == j).sum())
            band = int(
                ((s[part][:, j] > (ceiling or 2) - _ROUND_MARGIN)
                 & (s[part][:, j] <= (ceiling or 2) + _ROUND_MARGIN)).sum()
            )
            ties = int(
                (np.abs(s[part][:, j][:, None] - s[part][:, j][None, :])
                 <= 2 * _ROUND_MARGIN).sum(axis=1).max()
            )
            assert per_q <= k + ties + band, (j, per_q, ties, band)
        survivors += list(zip(qa[keep].tolist(), na[keep].tolist()))

    kept = set(survivors)
    for j in range(q):
        col = s[:, j]
        truth = _rounded_topk(ids, col, k, ceiling=ceiling)
        assert len(truth) == k
        missing = [nid for nid in truth if (j, nid) not in kept]
        assert missing == [], (j, missing)


@pytest.mark.parametrize(
    "name", ["ann_cosine_topk", "ann_cosine_filtered", "ann_hard_negatives"]
)
def test_ann_topk_window_fanin_bounded(spark, sf_dir, name):
    """Executed-plan pin for the pruned kernels: the MapInPandas stage
    (the rank window's input) emits at most
    n_queries x (TOP_K + band) x n_scan_partitions rows — and strictly
    fewer than the corpus x queries stream the pre-r8 kernels produced.
    (hard_negatives scans corpus + planted rows and keeps a boundary
    band around the ceiling; the +5 per-partition slack absorbs both.)"""
    from mapreduce_distributed_systems_spark.operators.similarity import (
        ANN_QUERY_CAP,
        QUERY_FILTER,
        TOP_K,
    )
    from mapreduce_distributed_systems_spark.sources import load_table
    df = get_spec(name).fn(spark, sf_dir)
    assert df.collect()

    def walk(node, out):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan(), out)
        if cls.endswith("QueryStageExec"):
            return walk(node.plan(), out)
        ms = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            ms[kv._1()] = kv._2().value()
        out.append((node.nodeName(), ms))
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next(), out)
        return out

    rows = walk(df._jdf.queryExecution().executedPlan(), [])
    # pythonNumRowsReceived = rows the Python kernel emitted back to the
    # JVM — the rank window's (pre-WindowGroupLimit) input stream
    emitted = [
        m["pythonNumRowsReceived"]
        for nm, m in rows
        if "MapInPandas" in nm and m.get("pythonNumRowsReceived")
    ]
    assert emitted, f"no MapInPandas metrics in plan: {[nm for nm, _ in rows]}"
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.count()
    n_q = min(emb.where(QUERY_FILTER).count(), ANN_QUERY_CAP)
    # hard_negatives unions the planted duplicates (one per query, an
    # extra ~1-row partition at test SFs); +1 covers the union branch
    n_parts = emb.rdd.getNumPartitions() + 1
    bound = n_q * (TOP_K + 5) * n_parts
    assert emitted[0] <= bound, (emitted, bound, n_parts)
    assert emitted[0] < corpus * n_q, (emitted, corpus, n_q)


def test_documents_fixture_is_pure_ascii():
    """ADVICE r7: the multimodal fake-decode oracles index CHARACTERS
    while the Spark kernels index UTF-8 BYTES, so their md5 parity
    rests on document text being pure ASCII (1 char == 1 byte). Pin
    that invariant across every fixture SF so a regeneration that
    introduces multi-byte text fails here instead of as an opaque
    driver hash mismatch."""
    import os

    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        for batch in pq.ParquetFile(path).iter_batches(columns=["text"]):
            for t in batch.column(0).to_pylist():
                assert t is None or t.isascii(), (sf, t[:60])


@pytest.mark.parametrize("ceiling", [None, 0.95])
def test_prune_mask_lossless_property(ceiling):
    """Property twin of the adversarial case: across many random score
    matrices — including degenerate all-equal columns and heavy
    rounding-boundary mass — the two-stage prune never loses a true
    rounded-order top-k row."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mapreduce_distributed_systems_spark.operators.similarity import (
        _ROUND_MARGIN,
        _consolidate_mask,
        _prune_mask,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 10**6),
        n=st.integers(8, 160),
        q=st.integers(1, 6),
        k=st.integers(1, 8),
        quantize=st.booleans(),
    )
    def check(seed, n, q, k, quantize):
        rng = np.random.RandomState(seed)
        s = rng.uniform(-1, 1, size=(n, q))
        if quantize:
            # mass ties + values exactly on rounding boundaries
            s = np.round(s, 6) + rng.choice(
                [0.0, 4.9e-7, 5e-7, 5.1e-7], size=s.shape
            )
        if ceiling is not None:
            # plant rows straddling the ceiling
            m = rng.rand(n, q) < 0.2
            s[m] = ceiling + rng.uniform(-2e-6, 2e-6, size=int(m.sum()))
        ids = rng.permutation(n).astype(np.int64)
        q_ids = np.arange(q, dtype=np.int64)
        kept: set[tuple[int, int]] = set()
        for part in np.array_split(np.arange(n), 3):
            cq, cn, cs = [], [], []
            for batch in np.array_split(part, 2):
                sb = s[batch].copy()
                if ceiling is not None:
                    maybe = (sb > ceiling - _ROUND_MARGIN) & (
                        sb <= ceiling + _ROUND_MARGIN
                    )
                    sd = np.where(sb <= ceiling - _ROUND_MARGIN, sb, -np.inf)
                    mask = _prune_mask(sd, k) | maybe
                else:
                    mask = _prune_mask(sb, k)
                ni, qi = np.nonzero(mask)
                cq.append(q_ids[qi])
                cn.append(ids[batch][ni])
                cs.append(sb[ni, qi])
            qa, na, sa = map(np.concatenate, (cq, cn, cs))
            keep = _consolidate_mask(qa, sa, q_ids, k, ceiling=ceiling)
            kept |= set(zip(qa[keep].tolist(), na[keep].tolist()))
        for j in range(q):
            truth = _rounded_topk(ids, s[:, j], k, ceiling=ceiling)
            missing = [nid for nid in truth if (j, nid) not in kept]
            assert missing == [], (j, missing)

    check()
