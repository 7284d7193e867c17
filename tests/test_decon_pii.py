"""Non-vacuousness guards for the planted-input operators added in
round 6. Their DuckDB oracles certify cross-engine equality (hash
match), but a hash match alone cannot tell whether the interesting
branch ever FIRED — if a future edit broke the plant (id slice drifts,
tail loses its shingles, PII string changes shape), both engines would
agree on the trivially-empty result and stay green. These tests pin
the branches hot."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import get_spec


def test_fuzzy_decon_flags_planted_neardups(spark, sf_dir):
    from mapreduce_distributed_systems_spark.operators.sampling import (
        DECON_FUZZY_THRESHOLD,
    )

    out = get_spec("corpus_decontamination_fuzzy").fn(spark, sf_dir).collect()
    assert out, "no contamination found — the plant is broken"
    # planted eval ids are negative (-doc_id - 1): sign-disjoint from
    # genuine non-negative ids at any corpus scale
    planted = [r for r in out if r.eval_doc_id < 0]
    # planted evals are train docs + a 3-token tail: high-but-not-1.0
    # Jaccard, well above the flag threshold, and every planted eval
    # whose source doc landed in the train split must be flagged
    assert planted, "no PLANTED near-dup was flagged"
    for r in planted:
        assert r.eval_split == "test"
        assert r.n_train_matches >= 1
        assert DECON_FUZZY_THRESHOLD <= r.max_jaccard < 1.0
    # the tail only ADDS shingles, so similarity stays high
    assert max(r.max_jaccard for r in planted) > 0.8


def test_pii_scrub_redacts_planted_pii(spark, sf_dir):
    from mapreduce_distributed_systems_spark.operators.text_prep import (
        _PII_MOD,
    )

    out = get_spec("text_pii_scrub").fn(spark, sf_dir)
    hit = out.where(F.col("doc_id") % _PII_MOD == 0)
    clean = out.where(F.col("doc_id") % _PII_MOD != 0)
    n_hit = hit.count()
    assert n_hit > 0
    # every planted doc has exactly the two planted emails + ONE phone:
    # the digit-run local part (123456789@example.org) matches the
    # phone shape in raw text but must be consumed by the email pass
    # first — n_phones == 2 here means the counts regressed to
    # raw-text spans (the ADVICE r6 overlap). No false positives on
    # the letters-only synthetic corpus.
    assert hit.where((F.col("n_emails") == 2) & (F.col("n_phones") == 1)).count() == n_hit
    assert clean.where((F.col("n_emails") > 0) | (F.col("n_phones") > 0)).count() == 0


def test_decontaminated_split_quarantines_train_only(spark, sf_dir):
    """The artifact query (round 7): leaked hashes must exist (the
    planted variants guarantee the branch), every quarantined row must
    be a leaked TRAIN row, and no eval row is ever quarantined (the
    benchmark stays fixed; train is what gets cleaned)."""
    rows = get_spec("pipeline_decontaminated_split").fn(spark, sf_dir).collect()
    assert rows
    leaked = [r for r in rows if r.leaked]
    quarantined = [r for r in rows if r.disposition == "quarantine"]
    assert leaked and quarantined, "contamination branch is vacuous"
    assert all(r.split == "train" and r.leaked for r in quarantined)
    assert all(
        r.disposition == "keep" for r in rows if r.split != "train"
    )
    # every leaked hash has both sides represented: each leaked train
    # row implies >= 1 leaked eval row and vice versa
    assert any(r.split != "train" for r in leaked)
    assert any(r.split == "train" for r in leaked)


def test_pii_scrub_replacement_spans(spark):
    """Pin the exact redacted string for a handcrafted doc so the
    regex COMMON-SUBSET contract (greedy, leftmost, no alternation)
    is visible in a literal, not just via corpus hashes."""
    from mapreduce_distributed_systems_spark.operators.text_prep import (
        PII_EMAIL_RE,
        PII_PHONE_RE,
    )

    df = spark.createDataFrame(
        [(1, "mail a.b-c%d@ex-1.org then call +44 20 7946 0958 ok 12 34")],
        "id long, text string",
    )
    got = df.select(
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE,
            "[PHONE]",
        ).alias("s")
    ).collect()[0].s
    # "12 34" is 5 chars — below the >=9-char phone shape — and stays
    assert got == "mail [EMAIL] then call [PHONE] ok 12 34"
