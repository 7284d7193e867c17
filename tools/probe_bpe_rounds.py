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

from mapreduce_distributed_systems_spark.functions.text import words  # noqa: E402
from mapreduce_distributed_systems_spark.operators.bpe import (  # noqa: E402
    _pair_counts,
)
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402

CHECKPOINT_EVERY = 16


def run(spark, sf_dir: str, rounds: int, checkpoint: bool) -> list[float]:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = (
        docs.select(F.explode(words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("f"))
        .persist()
    )
    wdf = wf.select(
        F.expr(
            "'|' || array_join(transform(sequence(1, length(word)), "
            "i -> substring(word, i, 1)), '|') || '|'"
        ).alias("w"),
        "f",
    )
    walls = []
    for rank in range(1, rounds + 1):
        t0 = time.time()
        top_rows = (
            _pair_counts(wdf)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top_rows:
            # vocabulary fully merged: every word is one symbol — the
            # merge count is data-bounded, report what completed
            print(f"pairs exhausted after {rank - 1} merges")
            break
        top = top_rows[0]
        wdf = wdf.select(
            F.expr(
                f"replace(w, '|{top['l']}|{top['r']}|', "
                f"'|{top['l']}{top['r']}|')"
            ).alias("w"),
            "f",
        )
        if checkpoint and rank % CHECKPOINT_EVERY == 0:
            wdf = wdf.localCheckpoint()
        walls.append(time.time() - t0)
    wf.unpersist()
    return walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=64)
    args = ap.parse_args()
    spark = get_spark("probe_bpe_rounds")

    for label, ck in (("naive (lineage grows)", False), ("checkpointed", True)):
        walls = run(spark, args.dir, args.rounds, ck)
        q = args.rounds // 4
        def band(xs):
            return f"{min(xs):.2f}-{max(xs):.2f} med {sorted(xs)[len(xs)//2]:.2f}"
        print(f"{label}: rounds 1-{q}: {band(walls[:q])} s | "
              f"rounds {3*q+1}-{args.rounds}: {band(walls[3*q:])} s")


if __name__ == "__main__":
    main()
