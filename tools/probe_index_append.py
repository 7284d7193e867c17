"""Streaming index append under sustained load (VERDICT r11 #6).

The exactly-once CONTENT property of the streamed BM25 append is
tested (kill-and-resume equality, tests/test_index_stream.py); what
was unmeasured is the steady-state cost law: as append batches
accrete committed versions, does the per-batch wall stay flat, or
does the version chain tax each commit?

What the code says should happen (storage/lexical_index.py
append_bm25_index): each append reads only the LATEST version (one
manifest + its tables — never the chain), does batch-sized
tokenize/aggregate work, and rewrites the merged artifact — so the
per-batch wall should be ~flat in the NUMBER of versions and grow
only with the INDEX SIZE the appended docs add. The commit does
rewrite the whole artifact under the simple parquet-dir versioning
contract (the documented trade-off; per-touched-bucket at 100 TB),
so the honest law is

    wall(batch i) ~ batch_work + rewrite(index_size_i)

with index_size_i growing by one batch per step. This probe drives N
appends of equal-sized batches and prints per-batch wall, committed
artifact bytes, and the wall trend, so "flat" is a measured row
rather than a claim — and if the trend is NOT flat modulo index
growth, that motivates compaction-on-append.

    python tools/probe_index_append.py [SF_DIR] [N_BATCHES]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402
from mapreduce_distributed_systems_spark.sources import load_table  # noqa: E402
from mapreduce_distributed_systems_spark.storage import lexical_index as li  # noqa: E402


def _artifact_bytes(base_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(base_dir):
        for name in files:
            total += os.path.getsize(os.path.join(root, name))
    return total


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_x100"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("probe_index_append")

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    base_dir = li._scratch_dir("append_probe_")

    # base = even docs; batch i = odd docs with (doc_id div 2) mod N = i
    split = li._scratch_dir("append_probe_base_")
    docs.where("doc_id % 2 = 0").write.mode("overwrite").parquet(
        f"{split}/documents.parquet"
    )
    t0 = time.perf_counter()
    li.build_and_commit_bm25(spark, split, base_dir)
    print(
        f"base build+commit: {time.perf_counter() - t0:7.2f} s "
        f"({_artifact_bytes(base_dir) / 1e6:.1f} MB)",
        flush=True,
    )

    walls = []
    for i in range(n_batches):
        batch = docs.where(
            (F.col("doc_id") % 2 == 1)
            & (F.pmod(F.col("doc_id") / F.lit(2), F.lit(n_batches))
               .cast("long") == i)
        )
        t0 = time.perf_counter()
        li.append_bm25_index(spark, batch, base_dir)
        wall = time.perf_counter() - t0
        walls.append(wall)
        print(
            f"append batch {i + 1:3d}/{n_batches}: wall={wall:7.2f} s "
            f"versions={i + 2} artifact={_artifact_bytes(base_dir) / 1e6:8.1f} MB",
            flush=True,
        )

    half = len(walls) // 2
    first, second = walls[:half], walls[half:]
    print(
        f"mean wall first half {sum(first) / len(first):6.2f} s, "
        f"second half {sum(second) / len(second):6.2f} s "
        f"(ratio {sum(second) / len(second) / (sum(first) / len(first)):.2f}"
        " — ~1.0 + index-growth share = flat in version count)",
        flush=True,
    )


if __name__ == "__main__":
    main()
