"""Chunk -> embed -> ANN-index ingest — the composition the chunking
module's append-stability contract exists for (chunking.py docstring:
deterministic windows make re-chunking appended documents produce
byte-identical chunk ids, so the chunk relation can feed the
frozen-centroid vector-index append path without invalidating
existing cells). This module certifies that composition end to end:

  chunk_relation (overlapping 64-token windows)
    -> DISTINCT chunk digests        (dedup-before-embed: boilerplate
                                      chunks index once)
    -> deterministic embedding       (md5-derived 64-dim vector — the
                                      documented stand-in for a real
                                      embedding model; the Spark-side
                                      plumbing (schema, quantization,
                                      assignment, cell-partitioned
                                      write) is the real path)
    -> IVF build + commit (v1)       (storage/vector_index.py)
    -> incremental ingest of NEW docs' chunks against the FROZEN v1
       centroids, skipping already-indexed digests (anti-join on the
       8-byte vec_id), committed as v2

STAGED r13 for the r14 registration slot (plans/registry.py rotation
note): code + DuckDB oracle + parity / append-stability tests ship
without the @register line, exactly the discipline every registration
since r10 has followed.

Embedding stand-in (NOT a model, deliberately): a chunk's vector is
the 64 bytes of md5(h||'a')||md5(h||'b')||md5(h||'c')||md5(h||'d'),
each byte re-centered to [-128, 127] as a double. Deterministic,
content-keyed, identical in Spark and DuckDB — so the ENTIRE
composed pipeline (chunk windows -> digests -> vectors -> int8
quantizer fit -> frozen-centroid assignment -> per-cell membership)
is hash-certifiable bit-for-bit. Swapping in a real encoder changes
one narrow projection; everything downstream is the certified path.

Scale shape: the chunk split is Exchange-free (chunking.py); DISTINCT
on the 16-byte digest is one map-side-combined shuffle; the embedding
is a narrow projection; the fit trains on the bounded md5-sample
(kmeans.py FIT_SAMPLE_CAP) with ivf_k_for scaling cells to corpus
size; the incremental leg touches ONLY the new batch (anti-join on
8-byte ids against the committed code lists, then one narrow
assignment pass) — nothing reprocesses the indexed corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.operators.chunking import (
    CHUNK_SPLIT_ORACLE,
    chunk_relation,
)
from mapreduce_distributed_systems_spark.operators.similarity import (
    DIM,
    IVF_KMEANS_ITER,
    IVF_KMEANS_K,
    _kmeans_cells_sql,
    ivf_k_for,
)
from mapreduce_distributed_systems_spark.sources import load_table

# --- deterministic chunk embedding (see module doc) -----------------------

_POOL_SPARK = (
    "concat(md5(concat(h, 'a')), md5(concat(h, 'b')), "
    "md5(concat(h, 'c')), md5(concat(h, 'd')))"
)
_VEC_SPARK = (
    f"transform(sequence(1, {DIM}), j -> "
    f"cast(conv(substring(hp, (j-1)*2 + 1, 2), 16, 10) as double) - 128.0d)"
)
_SID_SPARK = "cast(conv(substring(h, 1, 15), 16, 10) as bigint)"


def chunk_vectors(docs: DataFrame, parity: int) -> DataFrame:
    """(vec_id, v) for the DISTINCT chunk digests of the docs with
    doc_id % 2 == parity: 60-bit content id + the deterministic
    64-dim embedding. Narrow after one digest-keyed distinct."""
    distinct = (
        chunk_relation(docs)
        .where(F.col("doc_id") % 2 == parity)
        .select(F.col("chunk_md5").alias("h"))
        .distinct()
    )
    pooled = distinct.select(
        F.expr(_SID_SPARK).alias("vec_id"), F.expr(_POOL_SPARK).alias("hp")
    )
    return pooled.select("vec_id", F.expr(_VEC_SPARK).alias("v"))


def build_chunk_ivf(
    spark: SparkSession, docs: DataFrame, base_dir: str
) -> DataFrame:
    """The composed lifecycle against an inspectable artifact dir:
    v1 = fit + commit over the base docs' chunk vectors; v2 = the
    incremental ingest of the new docs' not-yet-indexed chunks
    against the FROZEN v1 centroids. Returns the certified per-cell
    membership report (cell, n_base, n_appended, cv_norm2) read back
    through the manifest."""
    import numpy as np

    from mapreduce_distributed_systems_spark.operators.kmeans import (
        assign_int8,
        kmeans_fit_int8,
        quantize_int8,
    )
    from mapreduce_distributed_systems_spark.storage.vector_index import (
        read_ivf_index,
        write_ivf_index,
    )

    # version 1: the scheduled build job over the base corpus' chunks
    base_v = chunk_vectors(docs, 0)
    q8b = quantize_int8(base_v)
    n_b = base_v.count()
    cents = kmeans_fit_int8(
        q8b, k=ivf_k_for(n_b), n_iter=IVF_KMEANS_ITER, n=n_b
    )
    ab = assign_int8(q8b, cents).select("vec_id", "cell")
    cells = spark.createDataFrame(
        [(int(c), [int(x) for x in cents[c]]) for c in range(len(cents))],
        "cell int, cv array<bigint>",
    )
    codes1 = q8b.join(ab, "vec_id").withColumn("gen", F.lit(1))
    write_ivf_index(
        codes1, cells, base_dir, meta={"n_chunks": n_b}, version=1
    )

    # incremental ingest: everything below runs off the COMMITTED
    # artifact — frozen centroids from the stored table, already-
    # indexed digests skipped via anti-join on the stored vec_ids
    codes_v1, cells_v1, _m = read_ivf_index(spark, base_dir, version=1)
    frozen = np.array(
        [r["cv"] for r in cells_v1.orderBy("cell").collect()], dtype=np.int64
    )
    new_v = chunk_vectors(docs, 1).join(
        codes_v1.select("vec_id"), "vec_id", "anti"
    )
    q8n = quantize_int8(new_v)
    an = assign_int8(q8n, frozen).select("vec_id", "cell")
    codes2 = codes_v1.unionByName(
        q8n.join(an, "vec_id").withColumn("gen", F.lit(2))
    )
    write_ivf_index(
        codes2, cells_v1, base_dir, meta={"appended": True}, version=2
    )

    codes, cells2, _m2 = read_ivf_index(spark, base_dir)  # latest = v2
    counts = codes.groupBy("cell").agg(
        F.sum((F.col("gen") == 1).cast("long")).alias("nb"),
        F.sum((F.col("gen") == 2).cast("long")).alias("na"),
    )
    return (
        cells2.join(counts, "cell", "left")
        .select(
            "cell",
            F.coalesce(F.col("nb"), F.lit(0).cast("long")).alias("n_base"),
            F.coalesce(F.col("na"), F.lit(0).cast("long")).alias(
                "n_appended"
            ),
            F.expr(
                "aggregate(transform(cv, x -> x * x), 0L, (a, x) -> a + x)"
            ).alias("cv_norm2"),
        )
        .orderBy("cell")
    )


# --- DuckDB oracle ---------------------------------------------------------
# Full bit-exact replay: the chunk relation (CHUNK_SPLIT_ORACLE
# verbatim), the deterministic embedding, the Lloyd fit over the base
# parity's distinct digests (via _kmeans_cells_sql's source hook),
# then the new parity's not-yet-indexed digests quantized and
# assigned against the FROZEN final centroids — mirroring
# storage/vector_index.py's _ivf_index_append_oracle tail.

_VEC_DUCK = (
    f"list_transform(range(1, {DIM + 1}), j -> "
    f"CAST(('0x' || substring(hp, (j-1)*2 + 1, 2))::BIGINT - 128 AS DOUBLE))"
)


def _chunk_vecs_duck(parity: int) -> str:
    return f"""
  SELECT vec_id, {_VEC_DUCK} AS v
  FROM (
    SELECT ('0x' || substring(h, 1, 15))::BIGINT AS vec_id,
           md5(h || 'a') || md5(h || 'b') ||
           md5(h || 'c') || md5(h || 'd') AS hp
    FROM (SELECT DISTINCT chunk_md5 AS h FROM cr
          WHERE doc_id % 2 = {parity}) d
  ) p"""


def _chunk_index_oracle() -> str:
    prev = f"cents{IVF_KMEANS_ITER}"
    fit = _kmeans_cells_sql(
        IVF_KMEANS_K,
        IVF_KMEANS_ITER,
        DIM,
        source=f"SELECT vec_id, v FROM bv",
        lead=(
            f"cr AS ({CHUNK_SPLIT_ORACLE}),\n"
            f"bv AS ({_chunk_vecs_duck(0)}\n),\n"
            f"nv0 AS ({_chunk_vecs_duck(1)}\n),\n"
            "nv AS (SELECT vec_id, v FROM nv0 WHERE vec_id NOT IN "
            "(SELECT vec_id FROM bv)),\n"
        ),
    )
    return fit + f""",
q8n AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(round(x / (greatest(list_max(
           list_transform(v, y -> abs(y))), 1e-12) / 127.0), 0) AS BIGINT))
           AS qv
  FROM nv
),
dn AS (
  SELECT q8n.vec_id, c.cell,
         CAST(list_sum(list_transform(range(1, {DIM + 1}),
           j -> (q8n.qv[j] - c.cv[j]) * (q8n.qv[j] - c.cv[j]))) AS BIGINT)
           AS dist2
  FROM q8n CROSS JOIN {prev} c
),
an AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
    FROM dn
  ) WHERE rn = 1
),
nb AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM af GROUP BY cell),
na AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM an GROUP BY cell)
SELECT c.cell,
       coalesce(nb.n, 0) AS n_base,
       coalesce(na.n, 0) AS n_appended,
       CAST(list_sum(list_transform(c.cv, x -> x * x)) AS BIGINT)
         AS cv_norm2
FROM {prev} c LEFT JOIN nb USING (cell) LEFT JOIN na USING (cell)
ORDER BY c.cell"""


CHUNK_INDEX_ORACLE = _chunk_index_oracle()


def pipeline_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged r13 query (oracle: CHUNK_INDEX_ORACLE), the r14
    registration candidate per the plans/registry.py rotation note:
    the chunk -> embed -> IVF ingest composition on the documents
    table, per-cell membership split by generation read back through
    the committed manifest."""
    from mapreduce_distributed_systems_spark.storage.scratch import (
        scratch_dir,
    )

    docs = load_table(spark, sf_dir, "documents")
    return build_chunk_ivf(spark, docs, scratch_dir("chunk_ivf_"))
