"""Data-quality audit: declarative constraint validation over the
star schema (the dbt-test / Deequ shape — the gate every 100 TB
ingest runs before data reaches training or BI).

Rule classes and their scale paths:
- intra-row predicates (range, sign, length-consistency): conditional
  sums fused into ONE scan per table — adding rules to a table adds
  zero passes;
- referential integrity: left-anti joins counting orphans, dim side
  broadcast;
- uniqueness: count keys with multiplicity > 1 (map-side-combined
  two-phase aggregate);
- cross-table reconciliation: order header total vs the rounded
  line-item sum (both engines round before the tolerance compare, per
  the float discipline).

Output is one row per rule: (rule, checked, violations) — the audit
summary a pipeline gates on; violating ROWS are a filter away with
the same predicates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.selection import (
    select_first_by_value as _select_first_by_value_helper,
)
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

PRICE_TOL = 1.0

QUALITY_ORACLE = f"""
WITH li_sum AS (
  SELECT l_orderkey,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS s
  FROM lineitem GROUP BY 1
)
SELECT 'customer_negative_acctbal' AS rule,
       CAST(count(*) AS BIGINT) AS checked,
       CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS violations
FROM customer
UNION ALL
SELECT 'documents_nchars_mismatch', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'events_nonpositive_value', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN value IS NULL OR value <= 0 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM events
UNION ALL
SELECT 'events_duplicate_ids',
       (SELECT CAST(count(*) AS BIGINT) FROM events),
       CAST(count(*) AS BIGINT)
FROM (SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1)
UNION ALL
SELECT 'orders_orderdate_out_of_range', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                       OR o_orderdate >= TIMESTAMP '1999-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_missing_customer',
       (SELECT CAST(count(*) AS BIGINT) FROM orders),
       CAST(count(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_missing_order',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
       CAST(count(*) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem_missing_part',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
       CAST(count(*) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'orders_totalprice_reconciles',
       (SELECT CAST(count(*) AS BIGINT) FROM orders),
       CAST(sum(CASE WHEN x.s IS NULL
                       OR abs(o.o_totalprice - x.s) > {PRICE_TOL}
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN li_sum x ON x.l_orderkey = o.o_orderkey
"""


def _rule_row(rule: str, checked: F.Column, violations: F.Column, df):
    return df.agg(
        F.lit(rule).alias("rule"),
        checked.cast("long").alias("checked"),
        violations.cast("long").alias("violations"),
    )


@register(
    "data_quality_audit",
    oracle=QUALITY_ORACLE,
    tags=("quality", "audit", "constraints"),
    doc="Declarative data-quality audit, one row per rule "
    "(rule, checked, violations): intra-row predicates as conditional "
    "sums fused into one scan per table, referential integrity as "
    "broadcast left-anti orphan counts, uniqueness as a "
    "multiplicity>1 two-phase aggregate, and header-vs-lines price "
    "reconciliation with in-query rounding on both engines before the "
    "tolerance compare. The Deequ/dbt-test gate shape for a 100 TB "
    "ingest: every rule's full-scan work is map-side combined and the "
    "audit emits O(#rules) rows.",
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    cnt = F.count("*")
    rows = [
        _rule_row(
            "customer_negative_acctbal",
            cnt,
            F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)),
            cust,
        ),
        _rule_row(
            "documents_nchars_mismatch",
            cnt,
            F.sum(
                F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
            ),
            docs,
        ),
        _rule_row(
            "events_nonpositive_value",
            cnt,
            F.sum(
                F.when(
                    F.col("value").isNull() | (F.col("value") <= 0), 1
                ).otherwise(0)
            ),
            ev,
        ),
    ]
    # uniqueness: ids with multiplicity > 1
    n_events = ev.agg(F.count("*").cast("long").alias("checked"))
    dup = (
        ev.groupBy("event_id")
        .agg(F.count("*").alias("m"))
        .where(F.col("m") > 1)
        .agg(F.count("*").cast("long").alias("violations"))
    )
    rows.append(
        n_events.crossJoin(F.broadcast(dup)).select(
            F.lit("events_duplicate_ids").alias("rule"),
            "checked",
            "violations",
        )
    )
    rows.append(
        _rule_row(
            "orders_orderdate_out_of_range",
            cnt,
            F.sum(
                F.when(
                    (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                    | (
                        F.col("o_orderdate")
                        >= F.lit("1999-01-01").cast("timestamp")
                    ),
                    1,
                ).otherwise(0)
            ),
            orders,
        )
    )

    # referential integrity: orphan counts via left-anti joins
    def _orphans(rule, fact, fact_key, dim, dim_key):
        total = fact.agg(F.count("*").cast("long").alias("checked"))
        orphan = (
            fact.join(
                F.broadcast(dim), F.col(fact_key) == F.col(dim_key), "left_anti"
            )
            .agg(F.count("*").cast("long").alias("violations"))
        )
        return total.crossJoin(F.broadcast(orphan)).select(
            F.lit(rule).alias("rule"), "checked", "violations"
        )

    rows.append(
        _orphans(
            "orders_missing_customer", orders, "o_custkey", cust, "c_custkey"
        )
    )
    rows.append(
        _orphans(
            "lineitem_missing_order", li, "l_orderkey", orders, "o_orderkey"
        )
    )
    rows.append(
        _orphans("lineitem_missing_part", li, "l_partkey", part, "p_partkey")
    )

    # cross-table reconciliation
    li_sum = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("s")
    )
    recon = (
        orders.join(li_sum, orders.o_orderkey == li_sum.l_orderkey, "left")
        .agg(
            F.count("*").cast("long").alias("checked"),
            F.sum(
                F.when(
                    F.col("s").isNull()
                    | (F.abs(F.col("o_totalprice") - F.col("s")) > PRICE_TOL),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("violations"),
        )
        .select(
            F.lit("orders_totalprice_reconciles").alias("rule"),
            "checked",
            "violations",
        )
    )
    rows.append(recon)
    return reduce(DataFrame.unionByName, rows)


# ------------------------------------------------------------------ #
# Model-based quality filtering: fasttext-style linear classifier
# inference with the hashing trick (the CCNet / C4 / Dolma "quality
# classifier" pipeline stage, run here as distributed inference).
# ------------------------------------------------------------------ #

CLS_BUCKETS = 4096  # hashing-trick feature space (2^12)
_CLS_MIX = 2654435761  # Knuth multiplicative mix for the frozen weights
_CLS_WMOD = 2001  # weights land in [-1000, 1000]

def _scored_cte(carry_cols: tuple[str, ...] = ()) -> str:
    """The frozen-model scoring CTE chain (tokenize -> hash bucket ->
    weight sum -> token-less-doc coalesce), shared by every oracle
    that reads classifier scores — the SQL twin of classifier_score's
    carry_cols, so the tokenizer/hash/weight formula lives ONCE.
    Yields a `scored` CTE with (doc_id, *carry_cols, n_tokens, score);
    score is already coalesced to 0 for token-less docs."""
    carry = "".join(f", {c}" for c in carry_cols)
    dcarry = "".join(f", d.{c}" for c in carry_cols)
    return f"""feats AS (
  SELECT doc_id{carry},
         ('0x' || substring(md5(tok), 1, 15))::BIGINT % {CLS_BUCKETS} AS b
  FROM (
    SELECT doc_id{carry},
           unnest(regexp_split_to_array(text, '[^\\p{{L}}]+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
), agg AS (
  SELECT doc_id{carry},
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum((b * {_CLS_MIX}) % {_CLS_WMOD} - {(_CLS_WMOD - 1) // 2})
              AS BIGINT) AS score
  FROM feats GROUP BY doc_id{carry}
), scored AS (
  SELECT d.doc_id{dcarry},
         CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         CAST(coalesce(a.score, 0) AS BIGINT) AS score
  FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
)"""


CLS_ORACLE = f"""
WITH {_scored_cte()}
SELECT doc_id, n_tokens, score,
       CASE WHEN score > 0 THEN 'keep' ELSE 'drop' END AS label
FROM scored
"""


@register(
    "quality_classifier_score",
    oracle=CLS_ORACLE,
    tags=("quality", "classifier", "text"),
    bench=True,
    doc="Linear quality-classifier inference with the hashing trick "
    "(the fasttext-shaped model CCNet/C4/Dolma pipelines run over "
    "every document): tokenize (reference tokenizer, case preserved), "
    "hash each token into one of CLS_BUCKETS feature buckets "
    "(md5-derived, identical in both engines), score = sum of the "
    "bucket weights, label = sign gate. Weights are a FROZEN model "
    "frozen as a pure function of the bucket index "
    "((b * Knuth-mix) % 2001 - 1000) so inference is certifiable "
    "integer arithmetic; a learned model would instead broadcast its "
    "D-entry weight table and join on b — same plan shape. Plan: "
    "scan -> explode (narrow) -> map-stage hash+weight -> ONE "
    "map-side-combined shuffle keyed on doc_id. No weight shuffle, "
    "no join, doc-scoped key (no hot key possible) — at 100 TB the "
    "exchange carries one (doc_id, partial sum) row per doc per "
    "partition.",
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classifier_score(load_table(spark, sf_dir, "documents"))


def classifier_score(docs: DataFrame, carry_cols: list[str] | None = None) -> DataFrame:
    """Score docs with the frozen hashing-trick model. `carry_cols`
    ride along in the groupBy key (doc_id determines them, so groups
    are unchanged) — the zero-cost way to keep e.g. `source` without a
    second doc-keyed join after the aggregate."""
    from mapreduce_distributed_systems_spark.functions.text import words

    carry = list(carry_cols or [])
    # explode_outer keeps token-less docs (scored 0/'drop'), mirroring
    # the oracle's LEFT JOIN — without a second scan or a join.
    toks = docs.select(
        "doc_id", *carry, F.explode_outer(words("text")).alias("tok")
    )
    w = (
        F.col("b") * F.lit(_CLS_MIX) % F.lit(_CLS_WMOD)
        - F.lit((_CLS_WMOD - 1) // 2)
    )
    return (
        toks.select(
            "doc_id",
            *carry,
            F.expr(
                "cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"
                f" % {CLS_BUCKETS}"
            ).alias("b"),
        )
        .groupBy("doc_id", *carry)
        .agg(
            F.count("b").cast("long").alias("n_tokens"),
            F.coalesce(F.sum(w), F.lit(0)).cast("long").alias("score"),
        )
        .withColumn(
            "label", F.when(F.col("score") > 0, "keep").otherwise("drop")
        )
    )


# ------------------------------------------------------------------ #
# Model-gated curation: keep the N best documents per source by
# classifier score — per-group top-k by VALUE at corpus scale.
# ------------------------------------------------------------------ #

CURATION_QUOTA = 25  # docs kept per source
_SCORE_BUCKETS = 65535  # bounded histogram domain for the threshold

CURATION_ORACLE = f"""
WITH {_scored_cte(("source",))}
SELECT source, doc_id, n_tokens, score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY score DESC, doc_id) AS rk
  FROM scored
)
WHERE rk <= {CURATION_QUOTA}
"""


@register(
    "curation_top_quality_per_source",
    oracle=CURATION_ORACLE,
    tags=("quality", "classifier", "curation", "sampling"),
    bench=True,  # round-7: headline set tracks the curation stage (VERDICT r6 item 4)
    doc="Model-gated curation: the N highest-classifier-score docs "
    "per source (ties broken by doc_id) — the 'keep the best slice "
    "of every domain' corpus-curation step. The oracle is the naive "
    "per-group window; the Spark plan is NOT: ordering by VALUE "
    "reuses the bucket-histogram threshold machinery "
    "(functions/selection.py) with a bucket derived from the score "
    "itself — global [min,max] score from one broadcast scalar agg, "
    "bucket = (max - score) * 65535 div span (monotone in score "
    "DESC, bounded domain regardless of corpus size). A "
    "low-cardinality `row_number OVER (PARTITION BY source ORDER BY "
    "score)` would funnel each source's entire corpus through one "
    "reducer at 100 TB; here every Window sees either the bounded "
    "histogram or one score-bucket's sliver. Equal scores always "
    "share a bucket (bucket is a pure function of score), so the "
    "residual pick's (score DESC, doc_id) order is exact. Because "
    "value-bucket occupancy is DATA-dependent (unlike uniform "
    "md5-prefix buckets), a tie-degenerate distribution — most of one "
    "source sharing a single score that straddles the quota boundary "
    "— would concentrate that tie mass in the one boundary bucket; "
    "select_first_by_value therefore refines INSIDE the boundary "
    "bucket: an exact-score histogram (map-side combined, one shuffled "
    "row per distinct score) keeps strictly-better rows outright, and "
    "the remaining tie mass — where the order degenerates to the "
    "doc_id tiebreak — goes through the threshold machinery once more "
    "on an id-span-scaled doc_id bucket, so the final row_number "
    "window sees an expected tie_mass/65536 sliver even for a "
    "constant-score corpus (property-tested in tests/test_selection.py "
    "against the naive window).",
    # r13 localization + r14 loud boundary-row guard live in the
    # shared helper — part of this query's certified definition
    helpers=(_select_first_by_value_helper,),
)
def curation_top_quality_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_distributed_systems_spark.functions.selection import (
        select_first_by_value,
    )

    docs = load_table(spark, sf_dir, "documents")
    # cached at the SCORED stage, not the bucketed one: the scalar
    # `bounds` agg runs BEFORE bucketing exists (the bucket needs it),
    # so caching only `bucketed` left bounds re-running the whole
    # scoring shuffle (round-7 profile: one extra full scoring pass).
    # Every selection-machinery consumer (histogram, tagged filters,
    # sliver, id-span agg) now derives from this cache with a cheap
    # broadcast-join projection. O(docs) rows of 4 columns; evicted at
    # next query entry (__spark_entry__._isolated).
    scored = (
        classifier_score(docs, carry_cols=["source"])
        .select("source", "doc_id", "n_tokens", "score")
        .cache()
    )
    # materialize the cache NOW (one count action, like the bounded
    # kmeans-centroid collects): AQE launches the selection machinery's
    # broadcast subqueries concurrently, and a lazily-populated cache
    # makes each of them race to recompute the scoring shuffle before
    # any finishes populating it (round-7 profile: ~10 concurrent
    # re-executions of the scoring subtree, 92 jobs for one query)
    scored.count()
    # global score span as LITERALS (one bounded scalar action over
    # the cache): the former 1-row crossJoin-broadcast span frame sat
    # under every branch of the selection machinery's plan — 20
    # BroadcastNestedLoopJoins in the executed r13-before plan, each
    # an AQE-compiled sub-job (r13 optimization; same bucket values).
    mx, mn = scored.agg(F.max("score"), F.min("score")).first()
    if mx is None:  # empty corpus: no rows to bucket, keep exprs typed
        mx, mn = 1, 0
    bucketed = scored.withColumn(
        "_sbkt",
        F.expr(
            f"CAST((({mx} - score) * {_SCORE_BUCKETS}) div "
            f"greatest({mx} - ({mn}), 1) AS BIGINT)"
        ),
    )
    picked = select_first_by_value(
        bucketed,
        group_cols=["source"],
        quota=F.lit(CURATION_QUOTA),
        value_col="score",
        id_col="doc_id",
        bucket_col="_sbkt",
        value_desc=True,
    )
    return picked.select("source", "doc_id", "n_tokens", "score")


# ---------------------------------------------------------------------------
# Token-budget-constrained curation: fill a training-token budget with
# the best-scoring documents (data-constrained training selection,
# Muennighoff et al. 2023, arXiv:2305.16264 — "how much data to keep"
# is a TOKEN budget, not a doc count, because training cost is tokens).
# ---------------------------------------------------------------------------

# budget = total corpus tokens div BUDGET_DIV (integer-exact; a
# corpus-relative budget keeps the query meaningful at every SF)
BUDGET_DIV = 4

TOKEN_BUDGET_ORACLE = f"""
WITH {{scored_cte}},
c AS (
  SELECT doc_id, n_tokens, score,
         sum(n_tokens) OVER (
           ORDER BY score DESC, doc_id
           ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM scored
),
tot AS (SELECT sum(n_tokens) AS t FROM scored)
SELECT doc_id, n_tokens, score, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c, tot
WHERE cum_tokens <= t // {BUDGET_DIV}
"""


@register(
    "curation_token_budget_select",
    oracle=TOKEN_BUDGET_ORACLE.format(scored_cte=_scored_cte()),
    tags=("quality", "curation", "training-data", "packing"),
    bench=True,
    doc=f"Token-budget-constrained curation: keep the best-scoring "
    f"docs (classifier score DESC, doc_id tiebreak) until the running "
    f"token total reaches total_tokens div {BUDGET_DIV} — the "
    "data-constrained-training selection where the budget is TOKENS, "
    "not documents (arXiv:2305.16264). The global running sum in "
    "score order is the packing.py distributed prefix sum: "
    "range-partition on (-score, doc_id), per-partition cumsum, "
    "O(#partitions) driver offsets — no single-reducer window, and "
    "score ties split across range partitions by the doc_id key so a "
    "constant-score corpus cannot create a hot partition. All-integer "
    "arithmetic end to end, so certification is hash-exact.",
)
def curation_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_distributed_systems_spark.operators.packing import (
        distributed_cumsum,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = classifier_score(docs).select("doc_id", "n_tokens", "score")
    tot = scored.agg(F.sum("n_tokens").cast("long").alias("t"))
    ordered = scored.withColumn("_neg", (-F.col("score")).cast("long"))
    c = distributed_cumsum(spark, ordered, "n_tokens", ["_neg", "doc_id"])
    return (
        c.crossJoin(F.broadcast(tot))
        .where(F.col("_csum") <= F.expr(f"t div {BUDGET_DIV}"))
        .select(
            "doc_id",
            "n_tokens",
            "score",
            F.col("_csum").cast("long").alias("cum_tokens"),
        )
    )
