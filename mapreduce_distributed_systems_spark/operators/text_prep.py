"""Corpus-preparation text transforms for training-data pipelines:
policy redaction, vocabulary building + token-id encoding, and
per-source distribution divergence.

These are the remaining standard pre-training corpus ops not already
covered by text_analysis.py (quality, lang-id, token counting,
fingerprints) and dedup.py: scrubbing a denylist out of the text,
building the token->id vocabulary a tokenizer trainer emits, and
measuring how far each source's unigram distribution sits from the
corpus mixture (the signal mixture-reweighting uses).

All three are pure built-in expressions (whole-stage codegen, zero
Python in the hot path) and each is oracle-checked against DuckDB.
Tokenization is the reference's letter-run tokenizer
(mrapps/wc.go:24-27 via functions/text.py), lowercased where a
vocabulary/distribution is being built (case-folding is the standard
normalization there; the wc-parity queries keep case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

# ---------------------------------------------------------------------------
# Denylist scrub: redact policy-listed tokens, account per document
# ---------------------------------------------------------------------------

# Tokens chosen to actually occur in the synthetic corpus so the
# redaction path is exercised (a denylist of absent words would make
# the oracle trivially green). In production this list is a broadcast
# dictionary of blocked terms; the plan shape is identical.
DENYLIST = ("slow", "merge", "the")

# \b is the ASCII word boundary in BOTH Java regex (Spark) and RE2
# (DuckDB); corpus text is ASCII letters + separators, so the regex
# hit set equals the token-membership hit set.
_DENY_RE = r"\b(" + "|".join(DENYLIST) + r")\b"
_DENY_IN = ", ".join(f"'{w}'" for w in DENYLIST)

SCRUB_ORACLE = f"""
WITH s AS (
  SELECT doc_id, lang, source,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'), x -> x <> '') AS toks,
         regexp_replace(text, '{_DENY_RE}', '[X]', 'g') AS scrubbed
  FROM documents
)
SELECT doc_id, lang, source,
       CAST(len(list_filter(toks, x -> x IN ({_DENY_IN}))) AS BIGINT) AS n_hits,
       CAST(length(scrubbed) AS BIGINT) AS n_chars_scrubbed,
       md5(scrubbed) AS scrubbed_md5
FROM s
"""


@register(
    "text_denylist_scrub",
    oracle=SCRUB_ORACLE,
    tags=("text", "quality", "redaction"),
    bench=True,  # round-5: map-only redaction wall-clock/io record
    doc="Denylist redaction: replace blocked terms with [X], report "
    "per-doc hit count + scrubbed length + scrubbed-content md5. "
    "Narrow map-only plan — no exchange; at 100 TB this runs at scan "
    "speed with the denylist compiled into the task binary (or "
    "broadcast, for dictionaries too large to inline).",
)
def text_denylist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scrub ONCE into a projection: referencing the regexp_replace per
    # output column would re-run the regex (no CSE across fields)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.size(
            F.filter(words("text"), lambda x: x.isin(*DENYLIST))
        ).cast("long").alias("n_hits"),
        F.regexp_replace("text", _DENY_RE, "[X]").alias("scrubbed"),
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        "n_hits",
        F.length("scrubbed").cast("long").alias("n_chars_scrubbed"),
        F.md5("scrubbed").alias("scrubbed_md5"),
    )


# ---------------------------------------------------------------------------
# Vocabulary build + encode: the tokenizer-trainer two-pass pattern
# ---------------------------------------------------------------------------

# Top-K by corpus frequency. 16 at test SF so the OOV branch is
# exercised (the synthetic corpus has ~31 distinct tokens); at real
# scale this is 10^5-ish — still driver-trivial, and the id-assignment
# sort stays bounded at K rows no matter the corpus size.
VOCAB_K = 16

VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}]+'),
                x -> x <> '')) AS tok
  FROM documents
),
counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok ASC) - 1 AS token_id
  FROM counts ORDER BY cnt DESC, tok ASC LIMIT {VOCAB_K}
),
enc AS (SELECT t.doc_id, v.token_id FROM toks t LEFT JOIN vocab v USING (tok))
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(token_id) AS BIGINT) AS n_invocab,
       round(CAST(count(*) - count(token_id) AS DOUBLE) / count(*), 4)
         AS oov_rate,
       CAST(coalesce(sum(token_id), 0) AS BIGINT) AS ids_sum
FROM enc GROUP BY doc_id
"""


@register(
    "vocab_build_encode",
    oracle=VOCAB_ORACLE,
    tags=("text", "vocab", "pipeline"),
    bench=True,  # round-5: two-pass vocab wall-clock/io record
    doc="Two-pass vocabulary build + encode: pass 1 aggregates corpus "
    "token counts and keeps the top-K (count desc, token asc — "
    "deterministic tiebreak) with rank ids; pass 2 broadcast-joins the "
    "vocabulary back onto the token stream and folds per-doc encoding "
    "stats (token count, in-vocab count, OOV rate, id checksum). The "
    "scale shape: one map-side-combined count shuffle, a K-row "
    "TakeOrdered, and a broadcast join — the corpus is never "
    "re-shuffled. The id-assignment window runs on K rows (bounded by "
    "construction), not on the corpus.",
)
def vocab_build_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(words(F.lower(F.col("text")))).alias("tok"))
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    order = [F.col("cnt").desc(), F.col("tok").asc()]
    # TakeOrderedAndProject(K) — never a full sort; the row_number
    # window then runs over K rows only (bounded SinglePartition)
    vocab = (
        counts.orderBy(*order)
        .limit(VOCAB_K)
        .withColumn("token_id", F.row_number().over(Window.orderBy(*order)) - 1)
        .select("tok", "token_id")
    )
    enc = toks.join(F.broadcast(vocab), "tok", "left")
    n = F.count("*")
    inv = F.count("token_id")
    return (
        enc.groupBy("doc_id")
        .agg(
            n.cast("long").alias("n_tokens"),
            inv.cast("long").alias("n_invocab"),
            F.round((n - inv).cast("double") / n, 4).alias("oov_rate"),
            F.coalesce(F.sum("token_id"), F.lit(0)).cast("long").alias("ids_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source unigram divergence: the mixture-reweighting signal
# ---------------------------------------------------------------------------

DIVERGENCE_ORACLE = """
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'),
                x -> x <> '')) AS tok
  FROM documents
),
src AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
srct AS (SELECT source, sum(c) AS sn FROM src GROUP BY source),
corp AS (SELECT tok, sum(c) AS ct FROM src GROUP BY tok),
tot AS (SELECT sum(c) AS tn FROM src)
SELECT source,
       CAST(sn AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(sum((CAST(c AS DOUBLE) / sn)
                 * ln((CAST(c AS DOUBLE) / sn) / (CAST(ct AS DOUBLE) / tn))), 6)
         AS kl_vs_corpus
FROM src JOIN srct USING (source) JOIN corp USING (tok) CROSS JOIN tot
GROUP BY source, sn
"""


@register(
    "source_unigram_divergence",
    oracle=DIVERGENCE_ORACLE,
    tags=("text", "sampling", "mixture"),
    doc="Per-source KL(source || corpus) over the unigram distribution "
    "— the divergence score data-mixture tuning reweights by. Plan: "
    "(source, token) counts are map-side combined, the corpus-marginal "
    "table is keyed on token (both join sides pre-aggregated, so the "
    "token join moves vocabulary-sized — not corpus-sized — data), and "
    "the per-source totals + grand total are broadcast. KL terms are "
    "rounded in both engines so the doubles emit bit-identical despite "
    "engine-specific summation order.",
)
def source_unigram_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(words(F.lower(F.col("text")))).alias("tok"))
    )
    # src feeds THREE consumers (the KL join, the per-source totals,
    # the corpus marginals) — without a cache Spark re-runs the
    # corpus explode+count per consumer (canonicalized-subtree reuse
    # does not survive the differing parents; see the round-5
    # duplicate-subplan sweep, BENCH_NOTES). Bounded at
    # |vocabulary| x |sources| rows, orders of magnitude below the
    # corpus. Evicted at the next query's entry (__spark_entry__).
    src = toks.groupBy("source", "tok").agg(F.count("*").alias("c")).cache()
    srct = src.groupBy("source").agg(F.sum("c").alias("sn"))
    corp = src.groupBy("tok").agg(F.sum("c").alias("ct"))
    tot = corp.agg(F.sum("ct").alias("tn"))
    p_s = F.col("c").cast("double") / F.col("sn")
    p_c = F.col("ct").cast("double") / F.col("tn")
    return (
        src.join(F.broadcast(srct), "source")
        .join(corp, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "sn")
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl_vs_corpus"),
        )
        .select(
            "source",
            F.col("sn").cast("long").alias("n_tokens"),
            "n_distinct",
            "kl_vs_corpus",
        )
    )


# ---------------------------------------------------------------------------
# PII scrub: pattern-based redaction of emails / phone numbers
# ---------------------------------------------------------------------------

# The C4/Dolma-style preprocessing step the denylist scrub doesn't
# cover: structural PII (emails, phone numbers) found by regex, not by
# dictionary. Patterns stay inside the Java-regex/RE2 COMMON SUBSET —
# character classes, bounded repeats, no alternation, no backrefs, no
# lookaround — so Spark and DuckDB match identical spans and the
# scrubbed-content md5 hash-certifies the cross-engine regex
# semantics (the actual risk in shipping regex redaction on two
# engines). The synthetic corpus contains no PII, so deterministic
# PII is PLANTED into a doc_id slice first (the DENYLIST pattern:
# a redaction path that never fires would certify vacuously).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9 -]{7,}[0-9]"
# the second address has a digit-run local part that ALSO matches the
# phone shape in raw text: it keeps the sequential-count contract hot
# (emails are redacted before phones are counted, so it contributes to
# n_emails only — the overlap ADVICE r6 flagged)
_PII_PLANT = (
    " contact alice.k@example.com or 123456789@example.org"
    " or +1 555 123 4567 now"
)
_PII_MOD = 13  # docs with doc_id % 13 == 0 get the planted PII tail

PII_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, lang, source,
         CASE WHEN doc_id % {_PII_MOD} = 0
              THEN text || ' {_PII_PLANT.strip()}'
              ELSE text END AS text
  FROM documents
),
e AS (
  SELECT doc_id, lang, source,
         len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
         regexp_replace(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g') AS after_email
  FROM corpus
),
s AS (
  SELECT doc_id, lang, source, n_emails,
         len(regexp_extract_all(after_email, '{PII_PHONE_RE}')) AS n_phones,
         regexp_replace(after_email, '{PII_PHONE_RE}', '[PHONE]', 'g') AS scrubbed
  FROM e
)
SELECT doc_id, lang, source,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       CAST(length(scrubbed) AS BIGINT) AS n_chars_scrubbed,
       md5(scrubbed) AS scrubbed_md5
FROM s
"""


@register(
    "text_pii_scrub",
    oracle=PII_ORACLE,
    tags=("text", "quality", "redaction", "pii"),
    bench=True,  # round-7: headline set tracks the PII stage (VERDICT r6 item 4)
    doc="Structural-PII redaction: count and replace email addresses "
    "([EMAIL]) and phone-number-shaped digit runs ([PHONE]) per "
    "document, emitting counts + scrubbed length + scrubbed-content "
    "md5. Patterns live in the Java-regex/RE2 common subset so the "
    "md5 certifies identical match SPANS across engines — the real "
    "hazard of dual-engine regex redaction. Redaction and counting "
    "are both SEQUENTIAL: emails first, then phones on the "
    "email-scrubbed text, so a digit-bearing email local part (e.g. "
    "123456789@x.com) is one email, not an email plus a phone, and "
    "n_phones always equals the number of [PHONE] insertions. Same "
    "narrow map-only plan as text_denylist_scrub: no exchange, "
    "scan-speed at 100 TB. "
    "PII is planted into a deterministic doc_id slice because the "
    "synthetic corpus has none (a never-firing redaction certifies "
    "vacuously).",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.when(
            F.col("doc_id") % _PII_MOD == 0,
            F.concat("text", F.lit(" " + _PII_PLANT.strip())),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # sequential scrub: emails first, then phones COUNTED AND replaced
    # on the email-scrubbed intermediate, in BOTH engines — so counts
    # always equal the number of tokens inserted and a digit-bearing
    # email local part is never double-counted as a phone
    after_email = docs.select(
        "doc_id",
        "lang",
        "source",
        F.regexp_count("text", F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_replace("text", PII_EMAIL_RE, "[EMAIL]").alias("after_email"),
    )
    s = after_email.select(
        "doc_id",
        "lang",
        "source",
        "n_emails",
        F.regexp_count("after_email", F.lit(PII_PHONE_RE))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace("after_email", PII_PHONE_RE, "[PHONE]").alias("scrubbed"),
    )
    return s.select(
        "doc_id",
        "lang",
        "source",
        "n_emails",
        "n_phones",
        F.length("scrubbed").cast("long").alias("n_chars_scrubbed"),
        F.md5("scrubbed").alias("scrubbed_md5"),
    )
