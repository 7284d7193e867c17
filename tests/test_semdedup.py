"""SemDeDup (staged r12, operators/semdedup.py): oracle parity, the
one-survivor-per-cluster contract, the paper's lowest-centroid-
similarity keep-rule on planted frames, and cell-local clustering."""

from __future__ import annotations

import pytest

import numpy as np
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.semdedup import (
    SEMDEDUP_ORACLE,
    SEMDEDUP_TAU,
    dedup_semantic_semdedup,
    semdedup_frame,
)
from tests.duck_oracle import compare_spark_vs_oracle


def test_semdedup_matches_oracle(spark, sf_dir):
    """The compare the driver gate would run at registration: the
    full fit -> assign -> cell-local cluster -> survivor pipeline vs
    the recursive-CTE DuckDB replay."""
    df = dedup_semantic_semdedup(spark, sf_dir)
    compare_spark_vs_oracle(df, SEMDEDUP_ORACLE, sf_dir)


def test_every_vector_appears_once(spark, sf_dir):
    out = dedup_semantic_semdedup(spark, sf_dir)
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n


def test_exactly_one_survivor_per_cluster(spark, sf_dir):
    out = dedup_semantic_semdedup(spark, sf_dir).cache()
    bad = (
        out.groupBy("cluster_rep")
        .agg(F.sum(F.col("keep").cast("int")).alias("n_keep"))
        .where(F.col("n_keep") != 1)
        .count()
    )
    assert bad == 0
    # rep is the min member id and a member itself
    assert out.where(F.col("cluster_rep") > F.col("vec_id")).count() == 0
    reps = out.select(F.col("cluster_rep").alias("vec_id")).distinct()
    owners = out.select("vec_id", "cluster_rep").join(reps, "vec_id")
    assert (
        owners.where(F.col("cluster_rep") != F.col("vec_id")).count() == 0
    ), "a cluster_rep row must belong to its own cluster"
    # clusters never span cells (SemDeDup defines dups within a cell)
    multi_cell = (
        out.groupBy("cluster_rep")
        .agg(F.countDistinct("cell").alias("nc"))
        .where(F.col("nc") > 1)
        .count()
    )
    assert multi_cell == 0
    out.unpersist()


def test_keep_rule_prefers_lowest_centroid_similarity():
    """Planted frame: three near-identical vectors at different
    magnitudes -> one cluster; the survivor is the LOWEST exact
    centroid dot (the paper's diversity-preserving rule), not the
    min id."""
    cent = np.array([10, 0, 0, 0], dtype=np.int64)
    m = np.array(
        [
            [100, 1, 0, 0],  # id 1: high centroid dot
            [50, 1, 0, 0],   # id 2: medium
            [20, 1, 0, 0],   # id 3: lowest centroid dot -> survivor
        ],
        dtype=np.int64,
    )
    rep, keep = semdedup_frame([1, 2, 3], m, cent, tau=0.99)
    assert list(rep) == [1, 1, 1]
    assert list(keep) == [False, False, True]


def test_keep_rule_tie_breaks_on_min_id():
    cent = np.array([1, 0], dtype=np.int64)
    m = np.array([[3, 4], [3, 4]], dtype=np.int64)  # identical dots
    rep, keep = semdedup_frame([7, 5], m, cent, tau=0.99)
    assert list(rep) == [5, 5]
    assert list(keep) == [False, True]  # id 5 wins the tie


def test_below_tau_vectors_stay_singletons():
    cent = np.array([1, 1], dtype=np.int64)
    m = np.array([[5, 0], [0, 5]], dtype=np.int64)  # orthogonal
    rep, keep = semdedup_frame([1, 2], m, cent, tau=SEMDEDUP_TAU)
    assert list(rep) == [1, 2]
    assert list(keep) == [True, True]


def test_transitive_chain_forms_one_cluster():
    """a~b and b~c above tau but a~c below: SemDeDup groups are
    connected components, so all three join and two are dropped."""
    cent = np.array([1, 0, 0], dtype=np.int64)
    a = np.array([100, 60, 0], dtype=np.int64)
    b = np.array([100, 0, 0], dtype=np.int64)
    c = np.array([100, 0, 60], dtype=np.int64)
    m = np.vstack([a, b, c])
    cos_ab = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    cos_ac = (a @ c) / (np.linalg.norm(a) * np.linalg.norm(c))
    tau = (cos_ab + cos_ac) / 2
    assert cos_ac < tau < cos_ab
    rep, keep = semdedup_frame([1, 2, 3], m, cent, tau=float(tau))
    assert list(rep) == [1, 1, 1]
    assert sum(keep) == 1


@pytest.mark.slow  # driver-budget profile, see pytest.ini
def test_seeded_random_differential_vs_oracle(spark):
    """Seeded random embedding corpora with PLANTED near-dups (scaled
    copies quantize to identical int8 vectors -> cos exactly 1) must
    match the DuckDB replay end to end — fit, assignment, cell-local
    components, survivor rule."""
    import random
    import tempfile

    import duckdb

    from mapreduce_distributed_systems_spark.operators.similarity import DIM

    for seed in (3, 11):
        rng = random.Random(seed)
        rows = []
        base_vecs = []
        for vec_id in range(90):
            v = [rng.uniform(-1.0, 1.0) for _ in range(DIM)]
            base_vecs.append(v)
            rows.append((vec_id, v))
        # planted duplicates: scaled copies of the first 10 vectors
        # (max-abs int8 quantization is scale-invariant, so the copy
        # lands on the SAME quantized vector in both engines)
        for j in range(10):
            rows.append((1000 + j, [x * 0.5 for x in base_vecs[j]]))
        d = tempfile.mkdtemp(prefix=f"semdedup_rand_{seed}_")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

        got = sorted(
            tuple(r) for r in dedup_semantic_semdedup(spark, d).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet/*.parquet')"
        )
        want = sorted(
            (int(r[0]), int(r[1]), int(r[2]), bool(r[3]))
            for r in con.execute(SEMDEDUP_ORACLE).fetchall()
        )
        assert got == want, f"seed {seed} diverged"
        # the planted copies really did cluster with their originals
        rep_of = {r[0]: r[2] for r in got}
        joined = sum(1 for j in range(10) if rep_of[1000 + j] == rep_of[j])
        assert joined == 10


def test_zero_norm_vectors_are_singletons():
    """ADVICE r10: an all-zero quantized vector has no cosine. numpy
    yields NaN (NaN >= tau is False) while DuckDB's total order ranks
    NaN above tau — both sides now EXCLUDE zero-norm rows from the dup
    graph explicitly, so a zero vector is always its own singleton
    cluster (and survives), even next to an identical zero vector."""
    m = [[0, 0, 0], [0, 0, 0], [3, 4, 0]]
    rep, keep = semdedup_frame([10, 20, 30], m, [1, 1, 1], tau=-0.5)
    assert list(rep) == [10, 20, 30]  # nobody clusters with anybody
    assert list(keep) == [True, True, True]


def test_cell_above_cap_fails_loudly():
    """ADVICE r10: a collapsed quantizer fit funnels thousands of rows
    into one cell; the dense Gram would OOM an executor. The kernel
    must refuse BEFORE allocating, naming the refit lever."""
    import pytest

    from mapreduce_distributed_systems_spark.operators.semdedup import (
        SEMDEDUP_CELL_CAP,
    )

    n = SEMDEDUP_CELL_CAP + 1
    ids = np.arange(n, dtype=np.int64)
    m = np.ones((n, 2), dtype=np.int64)
    with pytest.raises(RuntimeError, match="SEMDEDUP_CELL_CAP"):
        semdedup_frame(ids, m, [1, 1])


# ---- property-based invariants on the cell-local decision ----------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _frames(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    dim = draw(st.integers(min_value=2, max_value=6))
    ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    vals = st.integers(min_value=-127, max_value=127)
    # zero vectors ARE generated: the kernel defines zero-norm rows as
    # non-duplicates (singletons), matching the oracle's explicit
    # norm>0 pair guard (ADVICE r10)
    m = draw(
        st.lists(
            st.lists(vals, min_size=dim, max_size=dim),
            min_size=n, max_size=n,
        )
    )
    cent = draw(st.lists(vals, min_size=dim, max_size=dim))
    tau = draw(st.floats(min_value=-0.5, max_value=0.999))
    return ids, m, cent, tau


@given(_frames())
@settings(max_examples=60, deadline=None)
def test_frame_invariants_hold_on_random_inputs(frame):
    """For ANY cell contents: output covers every vector exactly once,
    rep is the min member id of a component containing the vector,
    exactly one keeper per component, and the keeper is the member
    with the lexicographically smallest (centroid_dot, vec_id)."""
    ids, m, cent, tau = frame
    rep, keep = semdedup_frame(ids, m, cent, tau=tau)
    ids_a = np.asarray(ids)
    m_a = np.asarray(m, dtype=np.int64)
    cent_a = np.asarray(cent, dtype=np.int64)
    assert len(rep) == len(keep) == len(ids)

    clusters: dict[int, list[int]] = {}
    for i, r in enumerate(rep):
        clusters.setdefault(int(r), []).append(i)
    for r, members in clusters.items():
        # rep is the min member id and a member
        assert r == min(ids_a[members])
        # exactly one keeper, and it is the (cdot, id)-argmin
        kept = [i for i in members if keep[i]]
        assert len(kept) == 1
        cd = m_a[members] @ cent_a
        want = min(zip(cd, ids_a[members]))
        got = (int(m_a[kept[0]] @ cent_a), int(ids_a[kept[0]]))
        assert got == (int(want[0]), int(want[1]))
        # component soundness: every member is connected to its
        # cluster through >=tau edges (spot-check: each member has at
        # least one >=tau neighbor within the cluster, unless alone)
        if len(members) > 1:
            for i in members:
                cos_i = [
                    (m_a[i] @ m_a[j])
                    / (np.linalg.norm(m_a[i]) * np.linalg.norm(m_a[j]))
                    for j in members
                    if j != i
                ]
                assert max(cos_i) >= tau - 1e-12
