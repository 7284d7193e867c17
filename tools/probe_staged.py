"""One COLD measurement of a STAGED (not yet registered) query
callable — probe_one's twin for operators awaiting a gate-window slot
(see plans/registry.py rotation notes).

    python tools/probe_staged.py MODULE:FUNC SF_DIR

e.g.
    python tools/probe_staged.py \
        mapreduce_distributed_systems_spark.storage.lexical_index:retrieval_phrase_match \
        /root/testdata/sf0.1

Same protocol as probe_one: new python process, new Spark session,
noop sink (full plan executes, nothing written), startup-inclusive.
"""

import importlib
import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402

spec, sf = sys.argv[1], sys.argv[2]
mod_name, fn_name = spec.split(":")
fn = getattr(importlib.import_module(mod_name), fn_name)
spark = get_spark("probe_" + fn_name)
t0 = time.perf_counter()
fn(spark, sf).write.format("noop").mode("overwrite").save()
print(fn_name, sf, round(time.perf_counter() - t0, 2), "s", flush=True)
