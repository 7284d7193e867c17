"""BM25 query-load scaling probe: wall vs query-block size at a fixed
corpus. The scale claim under test (operators/retrieval.py): past the
index build, per-query scoring work is bounded by QUERY_TERMS x
POSTING_CAP candidates, so total wall should be

    wall(n_q) ~ index_build_cost + n_q * bounded_per_query_cost

i.e. LINEAR in the query count with a small slope and a large
intercept (the build), never superlinear. The probe widens the query
cap in-process (the fn reads the module constant at call time; the
oracle is not consulted — this is a wall probe, correctness is the
driver/replay's job) and runs each load in the same warmed session.

    python tools/probe_bm25_queries.py [SF_DIR] [CAPS ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.operators import retrieval
from mapreduce_distributed_systems_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_x100"
caps = [int(c) for c in sys.argv[2:]] or [64, 256, 1024, 4096]

spark = get_spark("probe_bm25_queries")
# one discarded warm-up at the default cap so JIT/session costs don't
# land on the first measured point
retrieval.doc_bm25_topk(spark, sf).write.format("noop").mode(
    "overwrite"
).save()
spark.catalog.clearCache()

orig_cap, orig_filter = retrieval.BM25_QUERY_CAP, retrieval.BM25_QUERY_FILTER
try:
    for cap in caps:
        retrieval.BM25_QUERY_CAP = cap
        # widen the stride with the cap so the filter yields at least
        # `cap` candidates on the probe dirs (stride 10 -> plenty)
        retrieval.BM25_QUERY_FILTER = "doc_id % 10 = 0"
        t0 = time.perf_counter()
        df = retrieval.doc_bm25_topk(spark, sf)
        n_rows = df.count()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        print(
            f"cap={cap:5d} rows={n_rows:6d} wall={wall:7.2f} s "
            f"({wall / cap * 1000:6.2f} ms/query incl. build)",
            flush=True,
        )
finally:
    retrieval.BM25_QUERY_CAP = orig_cap
    retrieval.BM25_QUERY_FILTER = orig_filter
