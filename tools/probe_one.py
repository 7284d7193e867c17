"""One COLD measurement of one registered query: new python process,
new Spark session, noop sink (executes the full plan, writes nothing).

    python tools/probe_one.py QUERY_NAME SF_DIR

This is the protocol behind every 1x/10x row in BENCH_NOTES.md —
cold numbers are startup-inclusive (~6-8 s JVM+session), which is why
cheap-plan rows cluster there; the ratio column is what matters.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.plans.registry import get_spec
from mapreduce_distributed_systems_spark.session import get_spark

name, sf = sys.argv[1], sys.argv[2]
spark = get_spark("probe_" + name)
t0 = time.perf_counter()
get_spec(name).fn(spark, sf).write.format("noop").mode("overwrite").save()
print(name, sf, round(time.perf_counter() - t0, 2), "s", flush=True)
