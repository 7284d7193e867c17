"""Does BPE per-round cost stay flat once the word table is cached?

The scale claim (operators/bpe.py, SCALE.md): the corpus is read once,
and every merge round afterwards touches only the vocabulary-sized
distinct-word table — so a production 30-50k-merge train is round_cost
x merges, not corpus_cost x merges. This probe runs N merge rounds on
one corpus and prints the per-round wall curve; flat = the claim.

    python tools/probe_bpe_rounds.py [--dir /root/testdata/sf0.1] [--rounds 64]

Caveat this probe makes visible: the naive loop grows the LOGICAL PLAN
by one replace() per round (lineage depth = round index), so
plan-compile time creeps even though the data work is constant. The
probe therefore also materializes the word table every CHECKPOINT_EVERY
rounds (localCheckpoint — the production pattern for any
driver-iterated loop, same reason iterative MLlib algorithms
checkpoint), and prints both curves.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_distributed_systems_spark.operators.bpe import (  # noqa: E402
    _pair_counts,
    _symbolized,
    _word_freqs,
)
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402

CHECKPOINT_EVERY = 16


def run(spark, sf_dir: str, rounds: int, checkpoint: bool) -> list[float]:
    wf = _word_freqs(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    wdf = _symbolized(wf)
    walls = []
    for rank in range(1, rounds + 1):
        t0 = time.time()
        # one round at a time through the SHARED loop so probe and
        # query semantics cannot drift
        from mapreduce_distributed_systems_spark.operators.bpe import (
            _train_merges,
        )

        merges, wdf = _train_merges(wdf, 1)
        if not merges:
            # vocabulary fully merged: every word is one symbol — the
            # merge count is data-bounded, report what completed
            print(f"pairs exhausted after {rank - 1} merges")
            break
        if checkpoint and rank % CHECKPOINT_EVERY == 0:
            wdf = wdf.localCheckpoint()
        walls.append(time.time() - t0)
    wf.unpersist()
    return walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=64)
    ap.add_argument(
        "--checkpoint-only",
        action="store_true",
        help="skip the naive (lineage-growing) variant — required for "
        "long runs (>=1k rounds), where an unbounded plan depth is not "
        "a measurement but a hang",
    )
    args = ap.parse_args()
    spark = get_spark("probe_bpe_rounds")

    variants = (("naive (lineage grows)", False), ("checkpointed", True))
    if args.checkpoint_only:
        variants = (("checkpointed", True),)
    for label, ck in variants:
        walls = run(spark, args.dir, args.rounds, ck)
        n = len(walls)  # may be < args.rounds when pairs exhaust
        q = max(n // 4, 1)
        def band(xs):
            return f"{min(xs):.2f}-{max(xs):.2f} med {sorted(xs)[len(xs)//2]:.2f}"
        head, tail = walls[:q], walls[3 * q:] or walls[-1:]
        print(f"{label}: {n} rounds | 1-{q}: {band(head)} s | "
              f"{3*q+1}-{n}: {band(tail)} s")


if __name__ == "__main__":
    main()
