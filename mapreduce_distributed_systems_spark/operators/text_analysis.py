"""Text-analysis operators for training-data pipelines (north star):
quality scoring, n-gram/stopword language ID, token counting
(whitespace / letter-run / BPE-ish), document fingerprinting.

All pure built-in expressions (whole-stage codegen, zero Python in the
hot path); every query oracle-checked against DuckDB. The tokenizer is
the reference's (letter runs, functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

_SW_LIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, source, text,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1), 4)
         AS ttr,
       round(CAST(length(text) - length(regexp_replace(text, '[^\\p{{L}} ]', '', 'g'))
             AS DOUBLE) / greatest(length(text), 1), 4) AS punct_ratio,
       round(CAST(len(list_filter(toks, x -> lower(x) IN ({_SW_LIST_SQL})))
             AS DOUBLE) / greatest(len(toks), 1), 4) AS stopword_ratio,
       round(CAST(length(array_to_string(toks, '')) AS DOUBLE)
             / greatest(len(toks), 1), 4) AS avg_word_len
FROM t
"""


@register(
    "text_quality",
    oracle=QUALITY_ORACLE,
    tags=("text", "quality"),
    bench=True,
    doc="Per-doc quality features: length, type-token ratio, punctuation "
    "ratio, stopword ratio, avg word length.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenize ONCE into a materialized projection — referencing the
    # words() expression per feature column would re-run the regex
    # split for every output column (no CSE across project fields)
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", words("text")
    )
    toks = F.col("toks")
    n_toks = F.greatest(F.size(toks), F.lit(1)).cast("double")
    sw = F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS_EN))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(F.size(F.array_distinct(toks)) / n_toks, 4).alias("ttr"),
        F.round(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"[^\p{L} ]", ""))
            ).cast("double")
            / F.greatest(F.length("text"), F.lit(1)),
            4,
        ).alias("punct_ratio"),
        F.round(F.size(sw) / n_toks, 4).alias("stopword_ratio"),
        F.round(
            F.length(F.concat_ws("", toks)).cast("double") / n_toks, 4
        ).alias("avg_word_len"),
    )


# ---------------------------------------------------------------------------
# Language ID: stopword-profile scores + argmax with deterministic tiebreak
# ---------------------------------------------------------------------------

LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
}


def _lang_score_sql(lang: str, arr: str) -> str:
    lst = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return (
        f"CAST(len(list_filter({arr}, x -> lower(x) IN ({lst}))) AS DOUBLE)"
        f" / greatest(len({arr}), 1)"
    )


LANG_ID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'), x -> x <> '') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         {_lang_score_sql('en', 'toks')} AS s_en,
         {_lang_score_sql('de', 'toks')} AS s_de,
         {_lang_score_sql('es', 'toks')} AS s_es,
         {_lang_score_sql('fr', 'toks')} AS s_fr
  FROM t
),
pred AS (
  SELECT doc_id, lang,
         CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
              WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
              WHEN s_es >= s_fr THEN 'es'
              ELSE 'fr' END AS lang_pred
  FROM scored
)
SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY lang, lang_pred
"""


@register(
    "lang_id_confusion",
    oracle=LANG_ID_ORACLE,
    tags=("text", "lang-id"),
    doc="Stopword-profile language ID (en/de/es/fr), reported as a "
    "labeled-vs-predicted confusion table.",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = words("text")
    scored = docs.select("doc_id", "lang", toks.alias("toks"))
    for lang, sw in LANG_PROFILES.items():
        ratio = F.size(F.filter(F.col("toks"), lambda x: F.lower(x).isin(*sw))) / (
            F.greatest(F.size("toks"), F.lit(1)).cast("double")
        )
        scored = scored.withColumn(f"s_{lang}", ratio)
    pred = scored.withColumn(
        "lang_pred",
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr"),
    )
    return pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))


TOKEN_COUNT_ORACLE = """
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT)
         AS ws_tokens,
       CAST(sum(len(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> ''))) AS BIGINT)
         AS word_tokens,
       CAST(sum(len(regexp_extract_all(text, '\\p{L}{1,4}'))) AS BIGINT) AS subword_tokens
FROM documents
GROUP BY source
"""


@register(
    "token_count_methods",
    oracle=TOKEN_COUNT_ORACLE,
    tags=("text", "tokens"),
    doc="Token counting 3 ways per source: whitespace, letter-run words, "
    "BPE-ish fixed-max-width subword pieces.",
)
def token_count_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != F.lit("")))
    word = F.size(words("text"))
    sub = F.size(F.expr(r"regexp_extract_all(text, '\\p{L}{1,4}', 0)"))
    return (
        docs.select("source", ws.alias("ws"), word.alias("wt"), sub.alias("st"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("wt").cast("long").alias("word_tokens"),
            F.sum("st").cast("long").alias("subword_tokens"),
        )
    )


FINGERPRINT_ORACLE = """
WITH w AS (
  SELECT doc_id, text,
         list_sort(list_transform(range(1, greatest(length(text) - 7, 1) + 1, 4),
                   i -> md5(substring(text, i, 8)))) AS win_hashes
  FROM documents
)
SELECT doc_id,
       md5(text) AS content_md5,
       array_to_string(win_hashes[1:4], '|') AS winnow_fp
FROM w
"""


@register(
    "doc_fingerprint",
    oracle=FINGERPRINT_ORACLE,
    tags=("text", "fingerprint"),
    doc="Document fingerprints: full-content md5 + winnowing-style "
    "4-min-hash of 8-char windows (stride 4).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    win = F.expr(
        "array_sort(transform(sequence(1, greatest(length(text) - 7, 1), 4), "
        "i -> md5(substring(text, i, 8))))"
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.concat_ws("|", F.slice(win, 1, 4)).alias("winnow_fp"),
    )


BIGRAM_TOPK = 50

BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks WHERE len(t) >= 2
),
counted AS (
  SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
)
SELECT bigram, n FROM counted
ORDER BY n DESC, bigram
LIMIT {BIGRAM_TOPK}
"""


@register(
    "corpus_bigram_topk",
    oracle=BIGRAM_ORACLE,
    tags=("text", "ngram-stats"),
    doc="Corpus-level top-50 word bigrams — the LM-preprocessing "
    "vocabulary/statistics pass. Explode + two-phase hash aggregate "
    "(map-side combine bounds the shuffle at distinct-bigram "
    "cardinality); top-k via TakeOrderedAndProject, never a full sort.",
)
def corpus_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(words("text").alias("t")).where(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(BIGRAM_TOPK)
    )


# --------------------------------------------------------------------------
# Document chunking (round 5): the step between cleaning and packing
# in a training pipeline — long documents become overlapping
# fixed-token-budget chunks (the unit that gets embedded / packed /
# indexed). Token-based windows with overlap; each chunk is emitted as
# (doc_id, chunk_idx, start, token count, content hash) so the result
# is compact and certifiable while the Spark-side explode produces
# exactly the rows a downstream embed/pack stage would consume.
# --------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

# NB the stop bound: DuckDB range() EXCLUDES its stop, Spark
# sequence() INCLUDES it — the DuckDB stop carries "+ 1" (the same
# off-by-one ADVICE r4 caught in the passage/decontamination oracles).
CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                     x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks) - {CHUNK_OVERLAP}, 1) + 1,
                      {CHUNK_STRIDE})) AS start
  FROM t WHERE len(toks) > 0
),
c AS (
  SELECT doc_id, CAST(start AS BIGINT) AS chunk_start,
         toks[start:start + {CHUNK_TOKENS - 1}] AS chunk
  FROM s
)
SELECT doc_id,
       CAST((chunk_start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       chunk_start,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_hash
FROM c
"""


@register(
    "chunk_documents",
    oracle=CHUNK_ORACLE,
    tags=("text", "chunking", "pipeline"),
    doc=f"Overlapping fixed-token-budget chunking ({CHUNK_TOKENS} "
    f"tokens, {CHUNK_OVERLAP} overlap, stride {CHUNK_STRIDE}) — the "
    "document -> training-unit step between cleaning and "
    "packing/embedding. Pure codegen expressions (tokenize once, "
    "explode the window starts, slice); chunks are emitted as "
    "(doc_id, chunk_idx, start, token count, md5 of the chunk text) "
    "so the certified output is compact while the explode produces "
    "the row-per-chunk shape a downstream embed/pack stage consumes. "
    "Narrow plan: no shuffle at all — chunking fuses into the scan.",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_rows(load_table(spark, sf_dir, "documents"))


def chunk_rows(docs: DataFrame) -> DataFrame:
    """Chunking as a reusable stage over any (doc_id, text) frame —
    chunk_documents applies it to the whole table; the training-prep
    pipeline applies it to the train split."""
    toked = docs.withColumn("toks", words("text"))
    starts = F.expr(
        f"sequence(1, greatest(size(toks) - {CHUNK_OVERLAP}, 1), "
        f"{CHUNK_STRIDE})"
    )
    s = toked.where(F.size("toks") > 0).select(
        "doc_id", "toks", F.explode(starts).alias("start")
    )
    chunk = F.expr(f"slice(toks, start, {CHUNK_TOKENS})")
    return s.select(
        "doc_id",
        F.floor((F.col("start") - 1) / CHUNK_STRIDE).cast("long").alias(
            "chunk_idx"
        ),
        F.col("start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


PASSAGE_W = 32  # char window
PASSAGE_STRIDE = 16

PASSAGE_ORACLE = f"""
WITH wins AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(length(text) - {PASSAGE_W - 2}, 2) + 1, {PASSAGE_STRIDE}),
           i -> md5(substring(text, i, {PASSAGE_W})))) AS wh
  FROM documents
)
SELECT wh AS passage_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       count(*) AS n_occurrences
FROM wins
GROUP BY wh
HAVING count(DISTINCT doc_id) > 1
"""


@register(
    "dedup_repeated_passages",
    oracle=PASSAGE_ORACLE,
    tags=("dedup", "substring"),
    bench=True,
    doc=f"Exact repeated-passage detection (the substring-level dedup "
    f"signal from the dedup literature): hash {PASSAGE_W}-char windows "
    f"at stride {PASSAGE_STRIDE}, keep hashes appearing in more than "
    "one document. Shuffle carries 16-byte hashes, never text; "
    "map-side combine bounds it at distinct-window cardinality.",
)
def dedup_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wins = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {PASSAGE_W - 2}, 2), "
                f"{PASSAGE_STRIDE}), i -> md5(substring(text, i, {PASSAGE_W})))"
            )
        ).alias("passage_hash"),
    )
    return (
        wins.groupBy("passage_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") > 1)
    )


RARITY_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
                            x -> x <> '')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
scored AS (
  SELECT t.doc_id,
         CAST(length(printf('%b', v.cnt)) AS BIGINT) AS freq_bits
  FROM toks t JOIN vocab v ON v.tok = t.tok
)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(freq_bits), 4) AS avg_freq_bits,
       CAST(min(freq_bits) AS BIGINT) AS rarest_bits,
       CAST(max(freq_bits) AS BIGINT) AS commonest_bits
FROM scored GROUP BY doc_id
"""


# De-skew split point for the toks ⋈ vocab join (round-2 verdict item
# 6): a naive per-occurrence join sends every occurrence of "the" to
# one reducer. The plan below (a) first collapses occurrences to
# (doc_id, tok, c) — a NON-skewed key, map-side combinable — so a
# stopword contributes ONE row per containing doc, then (b) splits the
# vocabulary at RARITY_HEAD_MIN_CNT: tokens at/above it (the tiny
# Zipf head that causes all the skew) broadcast-join; the tail
# sort-merge-joins with every bucket provably < RARITY_HEAD_MIN_CNT
# rows. The union of the two inner joins is exactly the single inner
# join (vocab is derived from doc_tok, every token lands in exactly
# one side). Per-doc stats are then occurrence-weighted aggregates —
# integer arithmetic, so parity with the per-occurrence oracle is
# exact.
RARITY_HEAD_MIN_CNT = 1024


@register(
    "text_token_rarity",
    oracle=RARITY_ORACLE,
    tags=("text", "quality", "lm-score"),
    doc="Unigram-LM quality proxy with INTEGER-EXACT cross-engine "
    "parity: per-token corpus frequency mapped to floor(log2)+1 via "
    "binary-digit length (bin()/printf('%b') — no float log, whose "
    "last-ulp behavior differs between JVM and libm), then per-doc "
    "avg/min/max. Low avg_freq_bits = rare-token-heavy docs (OCR "
    "noise, gibberish). Skew-safe join: occurrences collapse to "
    "(doc_id, tok, count) before joining, the Zipf-head vocabulary "
    "broadcasts, and the tail join's buckets are bounded by "
    f"{RARITY_HEAD_MIN_CNT} rows by construction.",
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words("text")).alias("tok"))
    doc_tok = (
        toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c")).persist()
    )
    vocab = doc_tok.groupBy("tok").agg(F.sum("c").alias("cnt"))
    head = vocab.where(F.col("cnt") >= RARITY_HEAD_MIN_CNT)
    tail = vocab.where(F.col("cnt") < RARITY_HEAD_MIN_CNT)
    scored = doc_tok.join(F.broadcast(head), "tok").unionByName(
        doc_tok.join(tail, "tok")
    ).select(
        "doc_id", "c", F.length(F.bin("cnt")).cast("long").alias("freq_bits")
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(
            F.sum(F.col("c") * F.col("freq_bits")) / F.sum("c"), 4
        ).alias("avg_freq_bits"),
        F.min("freq_bits").alias("rarest_bits"),
        F.max("freq_bits").alias("commonest_bits"),
    )


# --------------------------------------------------------------------------
# TF-IDF top terms per document (round 5): the classic IR weighting as
# a certified query. All heavy aggregates are vocabulary- or
# (doc, term)-sized; the corpus size N rides a broadcast scalar, the
# document-frequency table joins on term (vocabulary-sized), and the
# top-3 rank windows per doc_id. Scores are rounded in-query in both
# engines BEFORE ranking (ln() last-ulp differences across libm
# implementations otherwise make the order engine-dependent — the
# same discipline source_unigram_divergence uses), with the term as
# the deterministic tiebreak.
# --------------------------------------------------------------------------

TFIDF_TOP = 3

TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                            x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY 1
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(n.nd / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term), n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf
FROM ranked WHERE rn <= {TFIDF_TOP}
"""


@register(
    "doc_tfidf_topterms",
    oracle=TFIDF_ORACLE,
    tags=("text", "tfidf", "feature-prep"),
    doc=f"Top-{TFIDF_TOP} TF-IDF terms per document (tf x ln(N/df)): "
    "term counts and document frequencies are "
    "vocabulary-/(doc,term)-sized two-phase aggregates, N is one "
    "broadcast scalar, and the rank window partitions by doc_id. "
    "Scores round to 6 decimals in BOTH engines before ranking "
    "(libm ln() ulp drift would otherwise flip engine-dependent "
    "near-ties), with term-ascending as the deterministic tiebreak — "
    "the float discipline the KL-divergence query established.",
)
def doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(words("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    n = docs.agg(F.count("*").cast("double").alias("nd"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("nd") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TFIDF_TOP)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filters (round 5). Rae et al. 2021 ("Scaling
# Language Models: ... Gopher", arXiv:2112.11446, Table A1) drop docs
# dominated by repeated n-grams; the two rules expressible exactly over
# this corpus are (a) the fraction of all bigram occurrences taken by
# the single most frequent bigram and (b) the fraction of trigram
# occurrences that are repeats of an earlier trigram. Both are integer
# ratios — hash-certifiable without float-order concerns.
# ---------------------------------------------------------------------------

TOP_BIGRAM_MAX_FRAC = 0.20
DUP_TRIGRAM_MAX_FRAC = 0.30

_REP_TOKS_DUCK = (
    "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')"
)

REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_REP_TOKS_DUCK} AS toks FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(range(2, len(toks) + 1),
                        i -> toks[i - 1] || ' ' || toks[i]) AS bgs,
         list_transform(range(3, len(toks) + 1),
                        i -> toks[i - 2] || ' ' || toks[i - 1] || ' ' || toks[i])
           AS tgs
  FROM t
),
top_bg AS (
  SELECT doc_id, max(c) AS top_bigram_n
  FROM (
    SELECT doc_id, bg, count(*) AS c
    FROM (SELECT doc_id, unnest(bgs) AS bg FROM grams)
    GROUP BY doc_id, bg
  )
  GROUP BY doc_id
),
base AS (
  SELECT doc_id,
         CAST(len(bgs) AS BIGINT) AS n_bigrams,
         CAST(len(tgs) AS BIGINT) AS n_trigrams,
         CAST(len(list_distinct(tgs)) AS BIGINT) AS n_distinct_tg
  FROM grams
)
SELECT b.doc_id,
       b.n_bigrams,
       CAST(coalesce(t.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       round(CAST(coalesce(t.top_bigram_n, 0) AS DOUBLE)
             / greatest(b.n_bigrams, 1), 4) AS top_bigram_frac,
       round(CAST(b.n_trigrams - b.n_distinct_tg AS DOUBLE)
             / greatest(b.n_trigrams, 1), 4) AS dup_trigram_frac,
       (CAST(coalesce(t.top_bigram_n, 0) AS DOUBLE)
          / greatest(b.n_bigrams, 1) <= {TOP_BIGRAM_MAX_FRAC}
        AND CAST(b.n_trigrams - b.n_distinct_tg AS DOUBLE)
          / greatest(b.n_trigrams, 1) <= {DUP_TRIGRAM_MAX_FRAC}) AS keep
FROM base b LEFT JOIN top_bg t USING (doc_id)
"""


@register(
    "quality_repetition_filters",
    oracle=REPETITION_ORACLE,
    tags=("text", "quality", "pipeline"),
    doc="Gopher-style repetition rules: top-bigram dominance and "
    "duplicate-trigram fraction per doc, plus the keep/drop verdict. "
    "Trigram stats are pure array expressions fused into the scan (no "
    "shuffle); only the bigram mode needs a shuffle, and its key is "
    "(doc_id, bigram) — per-doc-scoped, so cardinality grows with the "
    "corpus but no key is ever hot, and the count is map-side "
    "combined. Integer-ratio outputs (one final double division on "
    "identical integers) keep it hash-certifiable.",
)
def quality_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("toks")
    )
    grams = docs.select(
        "doc_id",
        # sequence(2, 1) in Spark DESCENDS (it never returns empty), so
        # short docs must be guarded explicitly to mirror DuckDB's
        # empty range(2, 2)
        F.expr(
            "CASE WHEN size(toks) < 2 THEN cast(array() AS array<string>)"
            " ELSE transform(sequence(2, size(toks)),"
            " i -> concat(element_at(toks, i - 1), ' ', element_at(toks, i)))"
            " END"
        ).alias("bgs"),
        F.expr(
            "CASE WHEN size(toks) < 3 THEN cast(array() AS array<string>)"
            " ELSE transform(sequence(3, size(toks)),"
            " i -> concat(element_at(toks, i - 2), ' ',"
            "             element_at(toks, i - 1), ' ', element_at(toks, i)))"
            " END"
        ).alias("tgs"),
    )
    top_bg = (
        grams.select("doc_id", F.explode("bgs").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    base = grams.select(
        "doc_id",
        F.size("bgs").cast("long").alias("n_bigrams"),
        F.size("tgs").cast("long").alias("n_trigrams"),
        F.size(F.array_distinct("tgs")).cast("long").alias("n_distinct_tg"),
    )
    joined = base.join(top_bg, "doc_id", "left").withColumn(
        "top_bigram_n", F.coalesce("top_bigram_n", F.lit(0)).cast("long")
    )
    nb = F.greatest(F.col("n_bigrams"), F.lit(1))
    nt = F.greatest(F.col("n_trigrams"), F.lit(1))
    top_frac = F.col("top_bigram_n").cast("double") / nb
    dup_frac = (F.col("n_trigrams") - F.col("n_distinct_tg")).cast("double") / nt
    return joined.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_n",
        F.round(top_frac, 4).alias("top_bigram_frac"),
        F.round(dup_frac, 4).alias("dup_trigram_frac"),
        (
            (top_frac <= F.lit(TOP_BIGRAM_MAX_FRAC))
            & (dup_frac <= F.lit(DUP_TRIGRAM_MAX_FRAC))
        ).alias("keep"),
    )
