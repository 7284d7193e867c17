"""BM25 SERVE-path scaling probe: what the persisted index artifact
buys (storage/lexical_index.py). The rebuild path's query-load law is

    wall(n_q) ~ index_build_cost + n_q * bounded_per_query_cost

(tools/probe_bm25_queries.py, round 9: build ~24 s + ~5.8 ms/query at
the 100x dir). The serve path commits the index ONCE and answers each
query load from {manifest + probed term buckets}, so its intercept
should be the artifact LOAD (sub-second), not the build — per-query
cost unchanged. This probe builds once, then times query loads served
purely off the artifact.

    python tools/probe_bm25_serve.py [SF_DIR] [CAPS ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.session import get_spark
from mapreduce_distributed_systems_spark.storage import lexical_index as li

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_x100"
caps = [int(c) for c in sys.argv[2:]] or [64, 256, 1024]

spark = get_spark("probe_bm25_serve")

base = li._scratch_dir("bm25_probe_")
t0 = time.perf_counter()
li.build_and_commit_bm25(spark, sf, base)
print(f"build+commit: {time.perf_counter() - t0:7.2f} s", flush=True)

post, terms, _dl, manifest = li.read_bm25_index(spark, base)

# lexical_index binds the retrieval constants BY VALUE at import, so
# the query-load knob is patched on the lexical_index module itself
orig_cap, orig_filter = li.BM25_QUERY_CAP, li.BM25_QUERY_FILTER
try:
    # discarded warm-up so JIT/session costs don't land on point 1
    li.bm25_topk_from_index(spark, sf, post, terms, manifest).write.format(
        "noop"
    ).mode("overwrite").save()
    for cap in caps:
        li.BM25_QUERY_CAP = cap
        li.BM25_QUERY_FILTER = "doc_id % 10 = 0"
        t0 = time.perf_counter()
        df = li.bm25_topk_from_index(spark, sf, post, terms, manifest)
        n_rows = df.count()
        wall = time.perf_counter() - t0
        print(
            f"serve cap={cap:5d} rows={n_rows:6d} wall={wall:7.2f} s "
            f"({wall / cap * 1000:6.2f} ms/query, no build in the loop)",
            flush=True,
        )
finally:
    li.BM25_QUERY_CAP = orig_cap
    li.BM25_QUERY_FILTER = orig_filter
