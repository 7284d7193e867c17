"""WARM fresh-session medians for one registered query: new python
process, new Spark session, run the query N+1 times through the noop
sink, discard the first (cold) run, report the median of the rest.

    python tools/probe_warm.py QUERY_NAME SF_DIR [N_WARM_RUNS=5]

This is the round-7 drift-forensics protocol (VERDICT r6 item 3): the
in-suite bench median reflects a session that has already compiled
~80+ plans; this number reflects a session whose only history is the
same query. The gap between the two, on a pinned plan with
byte-identical io, attributes to session history (JIT/code-cache/GC),
not to the plan. Run SERIALIZED — never concurrently with another
Spark session — or the numbers are contaminated (BENCH_NOTES.md,
round-5 lesson).
"""

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.plans.registry import get_spec
from mapreduce_distributed_systems_spark.session import get_spark

name, sf = sys.argv[1], sys.argv[2]
n_warm = int(sys.argv[3]) if len(sys.argv) > 3 else 5
spark = get_spark("probe_warm_" + name)
walls = []
for i in range(n_warm + 1):
    df = get_spec(name).fn(spark, sf)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    walls.append(round(time.perf_counter() - t0, 4))
    spark.catalog.clearCache()
print(
    json.dumps(
        {
            "query": name,
            "sf_dir": sf,
            "cold": walls[0],
            "warm_walls": walls[1:],
            "warm_median": round(statistics.median(walls[1:]), 4),
        }
    ),
    flush=True,
)
