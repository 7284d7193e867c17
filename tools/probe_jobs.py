"""Job-level timeline of one registered query under the BENCH
protocol (fresh session, one cold noop pass, then a timed warm noop
pass): every Spark job the warm pass launches, with submission gaps.

    python tools/probe_jobs.py QUERY_NAME [SF_DIR]

The bench-set queries at sf0.1 shuffle kilobytes-to-megabytes, so
their wall is dominated by HOW MANY sequential jobs/barriers a query
pays, not by bytes (BENCH_IO.json shows <=18 MB shuffles against
multi-second walls). This tool attributes the warm wall to jobs —
driver-side collects, cache materializations, iterative fits — the
per-job complement of profile_query.py's per-operator SQLMetrics.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_distributed_systems_spark.plans.registry import get_spec
from mapreduce_distributed_systems_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spec = get_spec(name)
    spark = get_spark("probe_jobs_" + name)
    sc = spark.sparkContext

    def run_once() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    cold = run_once()
    store = sc._jsc.sc().statusStore()
    first_warm_job = store.jobsList(None).size()
    warm = run_once()
    time.sleep(0.2)  # status store is async

    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() < first_warm_job:
            continue
        sub = j.submissionTime().get().getTime()
        done = (
            j.completionTime().get().getTime()
            if j.completionTime().isDefined()
            else None
        )
        desc = (
            j.description().get() if j.description().isDefined() else j.name()
        )
        rows.append((j.jobId(), sub, done, str(desc)[:100]))
    rows.sort()
    print(f"\n=== {name} cold {cold:.2f}s warm {warm:.2f}s "
          f"({len(rows)} warm jobs) ===")
    prev_done = None
    for jid, sub, done, desc in rows:
        dur = (done - sub) / 1000.0 if done else float("nan")
        gap = (sub - prev_done) / 1000.0 if prev_done else 0.0
        prev_done = done or sub
        print(f"job {jid:4d}  dur {dur:7.3f}s  gap {gap:7.3f}s  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
