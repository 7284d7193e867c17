"""Measure a hot-bucket-capped pair stage for dedup_simhash64
(round-11 discovery, the ann_ivf_probe playbook: measure the fix
out-of-registry, land the fn+oracle edit in the next gate window with
room — see ROADMAP).

The registered query's band stage is an UNCAPPED self-join on
(k, bkey): 16-bit bands have a FIXED 65k-bucket keyspace, so bucket
occupancy — and candidate-pair volume sum(n_b^2) — grows
quadratically with the corpus (measured 105.4M join rows at the 100x
dir; the band stage dominates the query's wall and is the reason its
second-decade bench step sits at its linear bound instead of below
it). The MinHash-LSH stack solved the same problem in round 5:
ONE shuffle on the band key, a window-count hot-bucket cap with
REPORTED loss, collect_list bounded by the cap, and a nested
transform emitting each bucket's pairs — no self-join, candidate
volume <= buckets x cap^2/2 at ANY corpus size.

This probe runs both formulations on the same cached signatures and
reports: walls, candidate volumes, dropped-bucket accounting, and the
RECALL of the capped variant on the final hamming<=3 pair set (a
pair in a hot bucket can still be found through its other 3 bands —
only pairs whose EVERY matching band is hot are lost).

    python tools/probe_simhash_cap.py [SF_DIR] [CAP]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.simhash64 import (
    HAMMING_MAX64,
    simhash64_signatures,
)
from mapreduce_distributed_systems_spark.session import get_spark
from mapreduce_distributed_systems_spark.sources import load_table

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_x100"
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64

spark = get_spark("probe_simhash_cap")
sig = simhash64_signatures(load_table(spark, sf, "documents")).cache()
n_docs = sig.count()
print(f"docs: {n_docs}", flush=True)

bands = sig.select(
    "doc_id",
    "sim_hi",
    "sim_lo",
    F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
).withColumn(
    "bkey",
    F.expr(
        "((CASE WHEN k < 2 THEN sim_lo ELSE sim_hi END) "
        "div shiftleft(1L, 16 * (k % 2))) % 65536"
    ),
)

# ---- uncapped (the registered plan's pair stage) ------------------------
a, b = bands.alias("a"), bands.alias("b")
t0 = time.perf_counter()
uncapped = (
    a.join(
        b,
        (F.col("a.k") == F.col("b.k"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    .select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.sim_hi").alias("hi_a"),
        F.col("a.sim_lo").alias("lo_a"),
        F.col("b.sim_hi").alias("hi_b"),
        F.col("b.sim_lo").alias("lo_b"),
    )
    .distinct()
)
ham = F.expr("cast(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b) as bigint)")
full_pairs = (
    uncapped.withColumn("hamming", ham)
    .where(F.col("hamming") <= HAMMING_MAX64)
    .select("doc_a", "doc_b")
    .cache()
)
n_full = full_pairs.count()
print(
    f"UNCAPPED: {n_full} hamming<={HAMMING_MAX64} pairs, "
    f"{time.perf_counter() - t0:.1f} s",
    flush=True,
)

# ---- capped collect_list formulation (the LSH round-5 shape) ------------
t0 = time.perf_counter()
kept = (
    bands.withColumn("bn", F.count("*").over(W.partitionBy("k", "bkey")))
    .where(F.col("bn") <= cap)
    .drop("bn")
)
buckets = kept.groupBy("k", "bkey").agg(
    F.collect_list(F.struct("doc_id", "sim_hi", "sim_lo")).alias("ids")
)
pairs_expr = F.expr(
    "flatten(transform(sequence(1, size(ids) - 1), i -> "
    "transform(slice(ids, i + 1, size(ids) - i), y -> "
    "struct(least(element_at(ids, i).doc_id, y.doc_id) as doc_a, "
    "greatest(element_at(ids, i).doc_id, y.doc_id) as doc_b, "
    "element_at(ids, i).sim_hi as hi_a, element_at(ids, i).sim_lo as lo_a, "
    "y.sim_hi as hi_b, y.sim_lo as lo_b))))"
)
capped = (
    buckets.where(F.size("ids") >= 2)
    .select(F.explode(pairs_expr).alias("p"))
    .select("p.*")
    .distinct()
)
capped_pairs = (
    capped.withColumn("hamming", ham)
    .where(F.col("hamming") <= HAMMING_MAX64)
    .select("doc_a", "doc_b")
    .cache()
)
n_capped = capped_pairs.count()
wall_capped = time.perf_counter() - t0
hot = (
    bands.groupBy("k", "bkey")
    .agg(F.count("*").alias("bn"))
    .where(F.col("bn") > cap)
    .agg(
        F.count("*").alias("hot_buckets"),
        F.sum("bn").alias("hot_rows"),
    )
    .collect()[0]
)
missed = full_pairs.join(capped_pairs, ["doc_a", "doc_b"], "left_anti").count()
extra = capped_pairs.join(full_pairs, ["doc_a", "doc_b"], "left_anti").count()
print(
    f"CAPPED(cap={cap}): {n_capped} pairs, {wall_capped:.1f} s; "
    f"hot buckets {hot['hot_buckets']} ({hot['hot_rows']} rows dropped); "
    f"missed {missed} of {n_full} true pairs "
    f"(recall {1 - missed / max(n_full, 1):.4f}); "
    f"extra(must be 0): {extra}",
    flush=True,
)
