"""Dump `.explain("formatted")` for registered queries to files.

    python tools/dump_explain.py OUT_DIR QUERY [QUERY ...] [--sf SF_DIR]

Writes OUT_DIR/<query>_<suffix>.txt (suffix from $EXPLAIN_SUFFIX,
default 'before'). One fresh session for the batch; caches cleared
between queries (the bench/driver `_isolated` discipline). The dump is
the ANALYZED plan pre-execution (AdaptiveSparkPlan isFinalPlan=false)
— the artifact the optimization-round deliverables pin plan-shape
claims against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.plans.registry import get_spec
from mapreduce_distributed_systems_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    out_dir, names = args[0], args[1:]
    suffix = os.environ.get("EXPLAIN_SUFFIX", "before")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_explain")
    for name in names:
        spark.catalog.clearCache()
        df = get_spec(name).fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(path, len(txt.splitlines()), "lines", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
