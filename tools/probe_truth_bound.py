"""Unpruned vs MaxScore-bounded exact BM25 truth: the wall comparison
behind the r11 "built, measured, NOT wired" decision (BENCH_NOTES
"Round-11: MaxScore-bounded exact truth"), packaged as a rerunnable
probe so the natural-text leg (VERDICT r11 next-round #3) measures
the same thing the closed-vocabulary refutation did.

Runs both plans on a dir's documents table with the production audit
query block, reports each wall, and asserts the outputs are
IDENTICAL (the bound is lossless by construction; a mismatch here is
a bug, not a trade-off). Generate zipf inputs with
tools/gen_zipf_corpus.py.

    python tools/probe_truth_bound.py SF_DIR [QUERY_CAP]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_distributed_systems_spark.operators import retrieval  # noqa: E402
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipf_corpus"
    query_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("probe_truth_bound")
    k = retrieval.BM25_TOP_K

    def run(label, fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rows = fn().collect()
        wall = time.perf_counter() - t0
        print(f"{label:24s} wall={wall:8.2f} s rows={len(rows)}",
              flush=True)
        return wall, sorted(
            (r.query_id, r.doc_id, round(r.bm25, 6)) for r in rows
        )

    def unpruned():
        return (
            retrieval._bm25_ranked(
                spark, sf, None, query_cap=query_cap
            )
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "bm25")
        )

    def bounded():
        return retrieval._bm25_truth_topk(
            spark, sf, query_cap=query_cap
        ).select("query_id", "doc_id", "bm25")

    # discarded warm-up (session/JIT) on the cheaper point set
    retrieval._bm25_ranked(
        spark, sf, retrieval.POSTING_CAP, query_cap=8
    ).count()
    spark.catalog.clearCache()

    w_un, rows_un = run("unpruned truth", unpruned)
    w_bd, rows_bd = run("MaxScore-bounded truth", bounded)
    assert rows_un == rows_bd, (
        "bounded truth diverged from unpruned truth — lossless bound bug"
    )
    print(
        f"identical output; bounded/unpruned wall ratio = {w_bd / w_un:.2f}"
        f" ({'bounded WINS' if w_bd < w_un else 'unpruned wins'})",
        flush=True,
    )


if __name__ == "__main__":
    main()
