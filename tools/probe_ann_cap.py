"""Evidence probe for ROADMAP #26 / the staged r11 changed-fingerprint
edit: cap ann_ivf_probe's query block with ANN_QUERY_CAP. The
registered fn cannot be edited before its window slot opens
(fingerprint discipline), so this tool runs the CAPPED variant
out-of-registry and measures what the edit will buy at each decade —
so the r11 slot is spent on a measured change, not a predicted one.

    python tools/probe_ann_cap.py SF_DIR

The capped variant differs from operators/similarity.py
ann_ivf_probe in exactly one stanza: q gains
.orderBy("vec_id").limit(ANN_QUERY_CAP) — the same bounded-query
discipline every brute kernel already uses (and the shape of the r11
oracle edit: ORDER BY vec_id LIMIT cap in the qq CTE).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreduce_distributed_systems_spark.operators.dedup import (  # noqa: E402
    dot_expr,
    norm_expr,
)
from mapreduce_distributed_systems_spark.operators.similarity import (  # noqa: E402
    ANN_QUERY_CAP,
    N_PROBE,
    QUERY_FILTER,
    TOP_K,
)
from mapreduce_distributed_systems_spark.session import get_spark  # noqa: E402
from mapreduce_distributed_systems_spark.sources import load_table  # noqa: E402


def ann_ivf_probe_capped(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    comps = emb.select("label", F.posexplode("v").alias("d0", "x")).withColumn(
        "d", F.col("d0") + 1
    )
    cents = comps.groupBy("label", "d").agg(F.avg("x").alias("c"))

    q = (
        emb.where(F.expr(QUERY_FILTER))
        .orderBy("vec_id")
        .limit(ANN_QUERY_CAP)  # <- the one-line r11 edit under test
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )
    qcomps = q.select("query_id", F.posexplode("qv").alias("d0", "qx")).withColumn(
        "d", F.col("d0") + 1
    )
    qdist = (
        qcomps.join(F.broadcast(cents), "d")
        .groupBy("query_id", "label")
        .agg(
            F.round(
                F.sum((F.col("qx") - F.col("c")) * (F.col("qx") - F.col("c"))), 6
            ).alias("dist2")
        )
    )
    cw = W.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("label"))
    probed = (
        qdist.withColumn("cell_rank", F.row_number().over(cw))
        .where(F.col("cell_rank") <= N_PROBE)
        .select("query_id", "label")
    )
    embn = emb.withColumn("nrm", norm_expr("v"))
    cand = (
        F.broadcast(probed)
        .join(embn, "label")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("nv"),
            F.col("nrm").alias("nnrm"),
        )
    )
    qn = embn.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = cand.join(qn, "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(dot_expr("qv", "nv") / (F.col("qnrm") * F.col("nnrm")), 6).alias(
            "cos_sim"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= TOP_K
    )


if __name__ == "__main__":
    sf = sys.argv[1]
    spark = get_spark("probe_ann_cap")
    n_queries = (
        load_table(spark, sf, "embeddings").where(F.expr(QUERY_FILTER)).count()
    )
    t0 = time.perf_counter()
    ann_ivf_probe_capped(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.perf_counter() - t0
    print(
        f"ann_ivf_probe_capped {sf} {wall:.2f} s "
        f"(stride queries available: {n_queries}, cap: {ANN_QUERY_CAP})",
        flush=True,
    )
