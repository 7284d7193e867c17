"""PHRASE serve-path scaling probe (VERDICT r10 next-round #6): the
positional twin of tools/probe_bm25_serve.py. The claim under test is
the phrase serve plan's candidate bound — <= PHRASE_LEN x the rarest
phrase word's posting cap per query, read via partition-pruned term
buckets — which should make the measured query-load law

    wall(n_q) ~ artifact_load + n_q * bounded_per_query_cost

with the positional build paid ONCE outside the loop. Prints the
build cost, then per-cap walls and marginal ms/query served purely
off the committed artifact.

    python tools/probe_phrase_serve.py [SF_DIR] [CAPS ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.session import get_spark
from mapreduce_distributed_systems_spark.storage import lexical_index as li

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_x100"
caps = [int(c) for c in sys.argv[2:]] or [64, 256, 1024]

spark = get_spark("probe_phrase_serve")

base = li._scratch_dir("phrase_probe_")
t0 = time.perf_counter()
li.build_and_commit_bm25(spark, sf, base, with_positions=True)
print(f"build+commit (with positions): {time.perf_counter() - t0:7.2f} s",
      flush=True)

_post, _terms, _dl, manifest = li.read_bm25_index(spark, base)
positional = li.read_positional_postings(spark, manifest)

# lexical_index binds the retrieval constants BY VALUE at import, so
# the query-load knob is patched on the lexical_index module itself
orig_cap, orig_filter = li.BM25_QUERY_CAP, li.BM25_QUERY_FILTER
try:
    # discarded warm-up so JIT/session costs don't land on point 1
    li.phrase_topk_from_index(spark, sf, positional, manifest).write.format(
        "noop"
    ).mode("overwrite").save()
    # the served block is min(cap, docs matching the probe filter) —
    # divide by the ACTUAL count, not the cap, or the per-query figure
    # is understated on corpora smaller than cap x 10 (ADVICE r11)
    from mapreduce_distributed_systems_spark.sources import load_table

    n_matching = (
        load_table(spark, sf, "documents")
        .where("doc_id % 10 = 0")
        .count()
    )
    for cap in caps:
        li.BM25_QUERY_CAP = cap
        li.BM25_QUERY_FILTER = "doc_id % 10 = 0"
        n_q = min(cap, n_matching)
        t0 = time.perf_counter()
        df = li.phrase_topk_from_index(spark, sf, positional, manifest)
        n_rows = df.count()
        wall = time.perf_counter() - t0
        print(
            f"phrase serve cap={cap:5d} served={n_q:6d} rows={n_rows:6d} "
            f"wall={wall:7.2f} s ({wall / n_q * 1000:6.2f} ms/query, "
            "no build in the loop)",
            flush=True,
        )
finally:
    li.BM25_QUERY_CAP = orig_cap
    li.BM25_QUERY_FILTER = orig_filter
