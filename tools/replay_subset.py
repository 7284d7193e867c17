"""One-off spark-vs-duckdb parity replay for a subset of registered
queries (the round-close protocol's 'verify new queries at sf0.001
AND sf0.01' step):

    python tools/replay_subset.py SF_DIR name [name ...]
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from mapreduce_distributed_systems_spark.plans.registry import get_spec  # noqa: E402
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("replay_subset")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        spark.catalog.clearCache()
        spec = get_spec(name)
        sdf = spec.fn(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if spec.oracle is None:
            print(name, "rows-only", len(srows), flush=True)
            continue
        cur = con.execute(spec.oracle)
        dcols = [c[0] for c in cur.description]
        drows = cur.fetchall()
        scols = sdf.columns
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sn = sorted(tuple(str(r[i]) for i in so) for r in srows)
        dn = sorted(tuple(str(r[i]) for i in do) for r in drows)
        ok = sn == dn and sorted(scols) == sorted(dcols)
        bad += 0 if ok else 1
        print(
            name, "rows", len(srows), "MATCH" if ok else "MISMATCH",
            flush=True,
        )
        if not ok:
            if sorted(scols) != sorted(dcols):
                print("  spark cols:", sorted(scols))
                print("  duck  cols:", sorted(dcols))
            only_s = [r for r in sn if r not in set(dn)][:5]
            only_d = [r for r in dn if r not in set(sn)][:5]
            print("  only-spark:", only_s)
            print("  only-duck :", only_d)
    return bad


if __name__ == "__main__":
    sys.exit(main())
