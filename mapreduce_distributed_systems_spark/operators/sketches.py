"""Deterministic distinct-count sketches (north-star "novel sketch"
category): K-minimum-values (KMV) over md5 hashes.

Why KMV and not HyperLogLog: Spark's approx_count_distinct and
DuckDB's approx_count_distinct use different HLL implementations, so
an HLL estimate can never be hash-certified across engines. KMV's
state is just the k smallest md5 values of the distinct elements —
and md5 is identical everywhere — so the sketch, the estimate, and
the error are all bit-reproducible and the driver can certify the
whole estimator, exactly like the MinHash calibration query.

Estimator (Bar-Yossef et al. 2002, the classic KMV/bottom-k): with
U_(k) = the k-th smallest hash mapped to (0, 1],

    n_est = floor((k - 1) / U_(k))        (n_est = n_exact when the
                                           group has < k distinct
                                           elements — the sketch is
                                           then lossless)

U_(k) uses the first 8 hex chars (32 bits) + 1 to stay strictly
positive; both engines compute the identical integer so the division
is the identical double.

Scale design (100 TB): the k-smallest selection per group runs
through functions/selection.py's bucket-histogram machinery — one
map-side-combined histogram shuffle, then only the boundary bucket's
sliver is sorted. No per-group full sort anywhere; the exact
distinct count (emitted alongside for calibration) is the one
corpus-sized aggregate, and a production deployment would drop it
and keep only the O(k) sketch per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.selection import (
    hash_bucket,
    select_first_by_hash,
)
from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

KMV_K = 256

# portable hex->int for the first 8 hash chars (DuckDB has no conv())
def _hexval_duck(col: str = "kth") -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substring({col}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}"
        for i in range(8)
    )


_HEXVAL_DUCK = _hexval_duck("kth")


def _est_duck(kth: str, n_sketch: str) -> str:
    """DuckDB KMV estimate expression over qualified kth / n_sketch."""
    return (
        f"CASE WHEN {n_sketch} < {KMV_K} THEN {n_sketch} "
        f"ELSE CAST(floor(({KMV_K} - 1) "
        f"/ ((({_hexval_duck(kth)}) + 1) / 4294967296.0)) AS BIGINT) END"
    )

KMV_ORACLE = f"""
WITH toks AS (
  SELECT lang,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                     x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT lang,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS el
  FROM toks WHERE len(t) >= 3
),
el AS (SELECT DISTINCT lang, md5(el) AS h FROM sh),
ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM el
),
sk AS (
  SELECT lang, max(h) AS kth, CAST(count(*) AS BIGINT) AS n_sketch
  FROM ranked WHERE rn <= {KMV_K} GROUP BY lang
),
ex AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_exact FROM el GROUP BY lang)
SELECT e.lang, e.n_exact,
       CASE WHEN s.n_sketch < {KMV_K} THEN s.n_sketch
            ELSE CAST(floor(({KMV_K} - 1)
                 / ((({_HEXVAL_DUCK}) + 1) / 4294967296.0)) AS BIGINT)
       END AS n_est,
       round(abs(CASE WHEN s.n_sketch < {KMV_K} THEN s.n_sketch
                      ELSE CAST(floor(({KMV_K} - 1)
                           / ((({_HEXVAL_DUCK}) + 1) / 4294967296.0)) AS BIGINT)
                 END - e.n_exact) / e.n_exact, 4) AS rel_err
FROM ex e JOIN sk s ON s.lang = e.lang
"""


@register(
    "sketch_kmv_distinct",
    oracle=KMV_ORACLE,
    tags=("sketch", "approximate", "text"),
    bench=True,  # round-5: first wall-clock/io record for the sketch family
    doc=f"KMV (bottom-{KMV_K}) distinct-shingle sketch per language "
    "(3-word shingles — thousands of distinct elements per group, so "
    "the estimator branch is exercised, unlike the 31-word synthetic "
    "token vocabulary): the k smallest md5 values give "
    "n_est = (k-1)/U_(k), emitted next to the exact distinct count "
    "and the relative error. md5 order is engine-independent, so "
    "unlike HLL the whole estimator is hash-certifiable; the "
    "k-smallest selection runs through the bucket-histogram machinery "
    "(functions/selection.py), never a per-group full sort.",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    toks = docs.select("lang", words("text").alias("t")).where(F.size("t") >= 3)
    el = (
        toks.select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), i -> "
                    "concat_ws(' ', element_at(t, i), element_at(t, i + 1), "
                    "element_at(t, i + 2)))"
                )
            ).alias("el"),
        )
        .select("lang", F.md5("el").alias("h"))
        .distinct()
    )
    bucketed = el.withColumn("_bkt", hash_bucket(F.col("h")))
    sel = select_first_by_hash(
        bucketed, ["lang"], F.lit(KMV_K), [F.col("h")]
    )
    sk = sel.groupBy("lang").agg(
        F.max(_kth32()).alias("kth32"), F.count("*").alias("n_sketch")
    )
    ex = el.groupBy("lang").agg(F.count("*").alias("n_exact"))
    est = _kmv_estimate()
    return ex.join(sk, "lang").select(
        "lang",
        "n_exact",
        est.alias("n_est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


def _kth32(hcol: str = "h") -> F.Column:
    """32-bit numeric prefix of the hash for the kth-value aggregate.

    max over a STRING buffer falls to SortAggregate (non-hashable agg
    buffer — the r5/r13 lesson; caught by the r13 bench-set audit).
    The estimator reads only the first 8 hex chars of the kth value,
    and fixed-width lowercase hex is order-isomorphic to its numeric
    prefix (a <= b as strings => prefix32(a) <= prefix32(b)), so
    max(prefix32) == prefix32(max) EXACTLY — the oracle keeps its
    full-string max and both engines emit identical estimates."""
    return F.conv(F.substring(hcol, 1, 8), 16, 10).cast("long")


def _kmv_estimate() -> F.Column:
    """Spark KMV estimate from (kth32, n_sketch) columns."""
    u = (F.col("kth32") + 1) / F.lit(4294967296.0)
    return F.when(F.col("n_sketch") < KMV_K, F.col("n_sketch")).otherwise(
        F.floor(F.lit(KMV_K - 1) / u).cast("long")
    )


# --------------------------------------------------------------------------
# KMV mergeability as a certified query (round 5). The property that
# makes any sketch usable at 100 TB is DISTRIBUTIVE MERGE: partial
# sketches built independently per partition/group must combine into
# exactly the sketch of the union (bottom-k of a union of bottom-k
# sets == bottom-k of the union — every globally-k-smallest hash is
# k-smallest within its own group). This query builds per-language
# partial sketches, merges them, and emits the merged estimate NEXT TO
# the direct whole-corpus estimate; the oracle replays both pipelines,
# so the driver certifies that merged == direct bit-for-bit.
# --------------------------------------------------------------------------

KMV_MERGE_ORACLE = f"""
WITH toks AS (
  SELECT lang,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                     x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT lang,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS el
  FROM toks WHERE len(t) >= 3
),
el AS (SELECT DISTINCT lang, md5(el) AS h FROM sh),
gl AS (SELECT DISTINCT h FROM el),
plr AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM el
),
pool AS (SELECT DISTINCT h FROM plr WHERE rn <= {KMV_K}),
mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM pool),
msk AS (SELECT max(h) AS kth, CAST(count(*) AS BIGINT) AS n_sketch
        FROM mr WHERE rn <= {KMV_K}),
dr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gl),
dsk AS (SELECT max(h) AS kth, CAST(count(*) AS BIGINT) AS n_sketch
        FROM dr WHERE rn <= {KMV_K}),
ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM gl)
SELECT ex.n_exact,
       {_est_duck("dsk.kth", "dsk.n_sketch")} AS n_est_direct,
       {_est_duck("msk.kth", "msk.n_sketch")} AS n_est_merged,
       round(abs({_est_duck("msk.kth", "msk.n_sketch")} - ex.n_exact)
             / ex.n_exact, 4) AS rel_err
FROM ex, dsk, msk
"""


@register(
    "sketch_kmv_merge",
    oracle=KMV_MERGE_ORACLE,
    tags=("sketch", "approximate", "merge", "text"),
    doc=f"KMV sketch mergeability, certified: per-language bottom-"
    f"{KMV_K} partial sketches merged into a corpus-level sketch must "
    "equal the sketch built directly on the whole corpus (bottom-k of "
    "a union of bottom-k sets is bottom-k of the union). This is the "
    "distributive-merge property that makes the sketch a valid "
    "partial aggregate at 100 TB — partials per partition, merge at "
    "the reducer, no second pass. Emits the direct and merged "
    "estimates side by side; the oracle replays both pipelines.",
)
def sketch_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    toks = docs.select("lang", words("text").alias("t")).where(F.size("t") >= 3)
    el = (
        toks.select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), i -> "
                    "concat_ws(' ', element_at(t, i), element_at(t, i + 1), "
                    "element_at(t, i + 2)))"
                )
            ).alias("el"),
        )
        .select("lang", F.md5("el").alias("h"))
        .distinct()
    )
    # stage 1: independent per-language partial sketches (the map-side
    # partial aggregate), via the bucket-histogram selection
    bucketed = el.withColumn("_bkt", hash_bucket(F.col("h")))
    partials = select_first_by_hash(
        bucketed, ["lang"], F.lit(KMV_K), [F.col("h")]
    )
    # stage 2: merge = bottom-k of the distinct union of the partials
    pool = (
        partials.select("h")
        .distinct()
        .withColumn("g", F.lit(0))
        .withColumn("_bkt", hash_bucket(F.col("h")))
    )
    merged_sel = select_first_by_hash(pool, ["g"], F.lit(KMV_K), [F.col("h")])
    msk = merged_sel.agg(
        F.max(_kth32()).alias("kth32"), F.count("*").alias("n_sketch")
    ).select(_kmv_estimate().alias("n_est_merged"))
    # direct whole-corpus sketch for the equality certificate
    gl = (
        el.select("h")
        .distinct()
        .withColumn("g", F.lit(0))
        .withColumn("_bkt", hash_bucket(F.col("h")))
    )
    direct_sel = select_first_by_hash(gl, ["g"], F.lit(KMV_K), [F.col("h")])
    dsk = direct_sel.agg(
        F.max(_kth32()).alias("kth32"), F.count("*").alias("n_sketch")
    ).select(_kmv_estimate().alias("n_est_direct"))
    ex = gl.agg(F.count("*").alias("n_exact"))
    return (
        ex.crossJoin(F.broadcast(dsk))
        .crossJoin(F.broadcast(msk))
        .select(
            "n_exact",
            "n_est_direct",
            "n_est_merged",
            F.round(
                F.abs(F.col("n_est_merged") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_err"),
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters (round 5). Second sketch family next
# to KMV: frequency estimation in O(D*W) space. Like KMV, the sketch
# is built from md5 — both engines derive the identical (row, bucket)
# cell for every token, so the sketch contents, the estimates, and the
# CMS overestimate-only guarantee are all hash-certifiable, which no
# built-in approximate aggregate (approx_count_distinct, approx
# percentile) can offer across engines.
# --------------------------------------------------------------------------

CMS_D = 4     # hash rows
CMS_W = 512   # buckets per row
CMS_TOP = 20  # heavy-hitter candidates emitted


def _cms_bucket_duck(expr: str, r: str) -> str:
    """DuckDB bucket for token expr under hash row r (md5 -> first 8
    hex chars -> 32-bit int -> % CMS_W), via the portable hex->int."""
    h = f"md5(CAST({r} AS VARCHAR) || ':' || {expr})"
    val = " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({val}) % {CMS_W})"


CMS_ORACLE = f"""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                     x -> x <> '') AS t
  FROM documents
),
occ AS (SELECT unnest(t) AS w FROM toks),
cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY w),
hrows AS (SELECT unnest(range({CMS_D})) AS r),
cells AS (
  SELECT r, {_cms_bucket_duck("w", "r")} AS b, sum(c) AS cell
  FROM cnt, hrows GROUP BY 1, 2
),
cand AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT {CMS_TOP}),
probe AS (
  SELECT w, c, r, {_cms_bucket_duck("w", "r")} AS b FROM cand, hrows
)
SELECT p.w AS token, any_value(p.c) AS n_exact,
       CAST(min(cells.cell) AS BIGINT) AS n_est,
       CAST(min(cells.cell) - any_value(p.c) AS BIGINT) AS overestimate
FROM probe p JOIN cells ON cells.r = p.r AND cells.b = p.b
GROUP BY p.w
"""


def _cms_bucket_spark(col: F.Column, r: F.Column) -> F.Column:
    h = F.md5(F.concat(r.cast("string"), F.lit(":"), col))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_W).cast(
        "long"
    )


@register(
    "sketch_cms_heavyhitters",
    oracle=CMS_ORACLE,
    tags=("sketch", "approximate", "frequency", "text"),
    doc=f"Count-min sketch ({CMS_D} md5 hash rows x {CMS_W} buckets) "
    "over the token stream, certified end-to-end: estimates for the "
    f"top-{CMS_TOP} tokens (deterministic count-then-token order) are "
    "emitted NEXT TO their exact counts and the per-token "
    "overestimate, so the driver certifies both the sketch contents "
    "and the CMS one-sided-error guarantee (min over rows can only "
    "overcount). The sketch is LINEAR — cells here are built from the "
    "pre-aggregated exact counts (needed anyway for calibration), "
    "which by linearity equals building from raw occurrences; a "
    "production deployment streams occurrences straight into the "
    f"O({CMS_D}x{CMS_W}) cell array as a map-side partial aggregate "
    "and merges by addition, never materializing exact counts. "
    "Candidate probing joins the broadcast hash-row axis, then the "
    "tiny cells table back — no shuffle beyond the vocabulary "
    "aggregate.",
)
def sketch_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    occ = docs.select(F.explode(words("text")).alias("w"))
    cnt = occ.groupBy("w").agg(F.count("*").alias("c"))
    hrows = F.broadcast(
        spark.range(CMS_D).select(F.col("id").cast("int").alias("r"))
    )
    cells = (
        cnt.crossJoin(hrows)
        .select("r", _cms_bucket_spark(F.col("w"), F.col("r")).alias("b"), "c")
        .groupBy("r", "b")
        .agg(F.sum("c").alias("cell"))
    )
    cand = cnt.orderBy(F.col("c").desc(), "w").limit(CMS_TOP)
    probe = cand.crossJoin(hrows).select(
        "w", "c", "r", _cms_bucket_spark(F.col("w"), F.col("r")).alias("b")
    )
    return (
        probe.join(F.broadcast(cells), ["r", "b"])
        .groupBy(F.col("w").alias("token"))
        .agg(
            F.any_value("c").alias("n_exact"),
            F.min("cell").alias("n_est"),
            (F.min("cell") - F.any_value("c")).alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch (round 5). KLL / t-digest / GK summaries are
# merge-order-dependent, so (like HLL) they can never hash-certify
# across engines. A fixed-bin histogram CAN: bin counts are associative
# integer sums, the bin rule is integer arithmetic, and the quantile
# read-off is a deterministic scan of <= NBINS cumulative rows. This is
# the production percentile path events_anomaly_mad's doc points to —
# at 100 TB you keep the exact two-pass shape (min/max, then histogram)
# but the second pass shuffles at most |groups| x NBINS rows, never the
# stream. The certified guarantee is order-statistic containment —
# the ceil(q*n)-th value lies within one bin below the estimate,
# pinned by test_sketches.py. (There is deliberately NO claimed bound
# vs the interpolated percentile: in a heavy tail adjacent order
# statistics can sit arbitrarily far apart, so the exact_pq columns
# are calibration output, not an error reference.)
# ---------------------------------------------------------------------------

HIST_NBINS = 512

# (name, numerator, denominator) — k-th order statistic ceil(q * n)
_HIST_QS = (("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100))


def _hist_q_duck(num: int, den: int) -> str:
    return (
        f"min(CASE WHEN cum * {den} >= n * {num} THEN b END)"
    )


_HIST_PICK_COLS = ", ".join(
    _hist_q_duck(num, den) + f" AS b_{name}" for name, num, den in _HIST_QS
)
_HIST_EXACT_COLS = ", ".join(
    f"quantile_cont(vc, {num}.0 / {den}) AS x_{name}"
    for name, num, den in _HIST_QS
)
_HIST_OUT_COLS = ",\n       ".join(
    f"round(CAST(m.mn + (p.b_{name} + 1) * m.w - 1 AS DOUBLE) / 100, 2)"
    f" AS est_{name},\n       round(e.x_{name} / 100, 2) AS exact_{name}"
    for name, _, _ in _HIST_QS
)

HIST_QUANTILE_ORACLE = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events
),
mm AS (
  SELECT event_type, min(vc) AS mn, max(vc) AS mx,
         CAST(count(*) AS BIGINT) AS n,
         (max(vc) - min(vc)) // {HIST_NBINS} + 1 AS w
  FROM c GROUP BY event_type
),
hist AS (
  SELECT c.event_type, (c.vc - m.mn) // m.w AS b,
         CAST(count(*) AS BIGINT) AS cnt
  FROM c JOIN mm m USING (event_type)
  GROUP BY c.event_type, (c.vc - m.mn) // m.w
),
cum AS (
  SELECT event_type, b, sum(cnt) OVER (
    PARTITION BY event_type ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
picks AS (
  SELECT c.event_type,
         {_HIST_PICK_COLS}
  FROM cum c JOIN mm m USING (event_type)
  GROUP BY c.event_type
),
ex AS (
  SELECT event_type,
         {_HIST_EXACT_COLS}
  FROM c GROUP BY event_type
)
SELECT m.event_type, m.n,
       round(CAST(m.w AS DOUBLE) / 100, 2) AS bin_width,
       {_HIST_OUT_COLS}
FROM mm m JOIN picks p USING (event_type) JOIN ex e USING (event_type)
"""


@register(
    "sketch_histogram_quantiles",
    oracle=HIST_QUANTILE_ORACLE,
    tags=("sketch", "quantiles", "exact-arithmetic"),
    doc="Certified approximate percentiles (p50/p95/p99) per event type "
    "from a fixed 512-bin integer histogram: bin counts are associative "
    "integer sums (map-side combined, output bounded by groups x 512 "
    "regardless of stream size) and the read-off scans the cumulative "
    "histogram — so unlike KLL/t-digest the whole estimator "
    "hash-certifies. The certified guarantee is order-statistic "
    "containment (the ceil(q*n)-th value lies within one bin below "
    "the estimate, pinned by test); exact interpolated percentiles "
    "are emitted alongside for calibration.",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    mm = ev.groupBy("event_type").agg(
        F.min("vc").alias("mn"),
        F.max("vc").alias("mx"),
        F.count("*").alias("n"),
        (
            F.expr(f"div(max(vc) - min(vc), {HIST_NBINS})") + 1
        ).alias("w"),
    )
    hist = (
        ev.join(F.broadcast(mm), "event_type")
        .select("event_type", F.expr("div(vc - mn, w)").alias("b"))
        .groupBy("event_type", "b")
        .agg(F.count("*").alias("cnt"))
    )
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            W.partitionBy("event_type").orderBy("b").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ),
    )
    picks = (
        cum.join(F.broadcast(mm.select("event_type", "n")), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                F.min(
                    F.when(F.col("cum") * den >= F.col("n") * num, F.col("b"))
                ).alias(f"b_{name}")
                for name, num, den in _HIST_QS
            ]
        )
    )
    ex = ev.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(vc, {num}.0 / {den})").alias(f"x_{name}")
            for name, num, den in _HIST_QS
        ]
    )
    out_cols = [F.col("event_type"), F.col("n")]
    out_cols.append(F.round(F.col("w").cast("double") / 100, 2).alias("bin_width"))
    for name, _, _ in _HIST_QS:
        out_cols.append(
            F.round(
                (F.col("mn") + (F.col(f"b_{name}") + 1) * F.col("w") - 1).cast(
                    "double"
                )
                / 100,
                2,
            ).alias(f"est_{name}")
        )
        out_cols.append(F.round(F.col(f"x_{name}") / 100, 2).alias(f"exact_{name}"))
    return (
        mm.join(picks, "event_type").join(ex, "event_type").select(*out_cols)
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership (round 5, fourth sketch family after KMV /
# count-min / histogram-quantiles). Library blooms (Spark's
# bloom_filter_agg, Guava-backed) hash with engine-private functions,
# so their bit arrays can't be certified across engines. Building the
# filter RELATIONALLY from md5-derived positions can: the filter "bit
# array" is the distinct set of (hash-slice mod M) positions of the
# member keys, membership of a probe is "all K of its positions are
# set", and every step is integer arithmetic + set ops — certifiable,
# and exactly how a bloom build distributes anyway (the position set
# is a map-side-combined distinct, bounded by M regardless of member
# count; the probe check is a bounded join against it).
#
# The probe set is constructed DISJOINT from the member set (negated
# keys — TPC-H keys are strictly positive at any SF, so disjointness
# holds by sign, not by a shift constant the keys could outgrow), so
# every hit is a false positive and the emitted fp-rate is a clean
# read of the filter's operating point at the chosen M, K.
#
# M is NOT a constant: like lsh_bits_for / ivf_k_for, the size lever
# is code — M = M_UNIT * ceil(n_members / MEMBERS_PER_UNIT), computed
# from the same member count in both engines, so bits-per-member (and
# with it the fp rate) stays bounded as the corpus grows instead of
# the filter saturating. The K positions are four non-overlapping
# 8-hex (32-bit) slices of ONE md5, so the position domain covers any
# realistic M.
# ---------------------------------------------------------------------------

BLOOM_M_UNIT = 1 << 18
BLOOM_MEMBERS_PER_UNIT = 16384  # M_UNIT/16 -> >= 16 bits per member
BLOOM_K = 4  # hash functions: md5 hex slices [1-8],[9-16],[17-24],[25-32]


def _bloom_hex_duck(expr: str, start: int, n: int = 8) -> str:
    """Portable n-hex-char -> int (DuckDB), chars start..start+n-1."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    )


def _bloom_positions_duck(key: str) -> str:
    """K bloom positions of a BIGINT key (DuckDB list expression);
    expects a scalar `m` CTE holding the filter size."""
    slices = [
        f"({_bloom_hex_duck(f'md5(CAST({key} AS VARCHAR))', 1 + 8 * i)})"
        f" % (SELECT m FROM mcalc)"
        for i in range(BLOOM_K)
    ]
    return "[" + ", ".join(slices) + "]"


BLOOM_ORACLE = f"""
WITH members AS (
  SELECT DISTINCT l_orderkey AS key FROM lineitem
),
mcalc AS (
  SELECT CAST({BLOOM_M_UNIT} * ((count(*) + {BLOOM_MEMBERS_PER_UNIT - 1})
              // {BLOOM_MEMBERS_PER_UNIT}) AS BIGINT) AS m
  FROM members
),
bits AS (
  SELECT DISTINCT unnest({_bloom_positions_duck('key')}) AS pos FROM members
),
probes AS (
  SELECT -o_orderkey AS key FROM orders
),
probe_pos AS (
  SELECT DISTINCT key, unnest({_bloom_positions_duck('key')}) AS pos
  FROM probes
),
npos AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n_pos FROM probe_pos GROUP BY key
),
hits AS (
  SELECT p.key, CAST(count(*) AS BIGINT) AS n_set
  FROM probe_pos p JOIN bits b ON p.pos = b.pos
  GROUP BY p.key
),
fp AS (
  SELECT CAST(count(*) AS BIGINT) AS n_fp
  FROM hits h JOIN npos n USING (key) WHERE h.n_set = n.n_pos
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
       (SELECT CAST(count(*) AS BIGINT) FROM probes) AS n_probes,
       (SELECT m FROM mcalc) AS m_bits,
       (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
       n_fp,
       round(CAST(n_fp AS DOUBLE)
             / (SELECT count(*) FROM probes), 6) AS fp_rate
FROM fp
"""


@register(
    "sketch_bloom_membership",
    oracle=BLOOM_ORACLE,
    tags=("sketch", "approximate", "exact-arithmetic"),
    doc=f"Relational Bloom filter (K={BLOOM_K} md5-slice hashes; M "
    "grows with the member count so bits-per-member stays >= 16 — the "
    "size lever is code, like lsh_bits_for) over the has-lineitems "
    "order-key set, probed with a provably disjoint key set (negated "
    "orderkeys — disjoint by sign at ANY scale factor, where an "
    "additive shift breaks once keys outgrow the constant) so every "
    "hit is a false positive. The bit array is a "
    "map-side-combined distinct of integer positions (bounded by M "
    "regardless of member multiplicity), membership is a bounded join "
    "requiring every distinct probe position set, and — unlike "
    "bloom_filter_agg's engine-private hashing — every value "
    "hash-certifies. Emits M and the observed fp rate.",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    members = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("key"))
        .distinct()
    )
    mcalc = members.agg(
        (
            F.lit(BLOOM_M_UNIT)
            * F.expr(
                f"div(count(*) + {BLOOM_MEMBERS_PER_UNIT - 1}, "
                f"{BLOOM_MEMBERS_PER_UNIT})"
            )
        )
        .cast("long")
        .alias("m")
    )

    def positions(df: DataFrame, key: str) -> DataFrame:
        h = F.md5(F.col(key).cast("string"))
        exprs = [
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
            % F.col("m")
            for i in range(BLOOM_K)
        ]
        return (
            df.crossJoin(F.broadcast(mcalc))
            .select(key, F.explode(F.array(*exprs)).alias("pos"))
            .distinct()
        )

    bits = positions(members, "key").select("pos").distinct()
    # probe keys are NEGATED orderkeys: TPC-H keys are strictly
    # positive at every SF, so -o_orderkey is disjoint from the member
    # set by sign alone — unlike an additive shift, which silently
    # stops being disjoint once l_orderkey outgrows the shift constant
    probes = load_table(spark, sf_dir, "orders").select(
        (-F.col("o_orderkey")).alias("key")
    )
    probe_pos = positions(probes, "key")
    npos = probe_pos.groupBy("key").agg(F.count("*").alias("n_pos"))
    hits = (
        probe_pos.join(bits, "pos")
        .groupBy("key")
        .agg(F.count("*").alias("n_set"))
    )
    n_fp = (
        hits.join(npos, "key")
        .where(F.col("n_set") == F.col("n_pos"))
        .agg(F.count("*").cast("long").alias("n_fp"))
    )
    n_members = members.agg(F.count("*").cast("long").alias("n_members"))
    n_probes = probes.agg(F.count("*").cast("long").alias("n_probes"))
    bits_set = bits.agg(F.count("*").cast("long").alias("bits_set"))
    return (
        n_members.crossJoin(F.broadcast(n_probes))
        .crossJoin(F.broadcast(mcalc))
        .crossJoin(F.broadcast(bits_set))
        .crossJoin(F.broadcast(n_fp))
        .select(
            "n_members",
            "n_probes",
            F.col("m").alias("m_bits"),
            "bits_set",
            "n_fp",
            F.round(
                F.col("n_fp").cast("double") / F.col("n_probes"), 6
            ).alias("fp_rate"),
        )
    )
