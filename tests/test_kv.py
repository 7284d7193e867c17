"""KV replay property tests (SURVEY.md §5 plan): random op logs →
Spark replay must equal a ~15-line Python model replay mirroring
models/kv.go:40-54. Plus stream-vs-batch equivalence."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_distributed_systems_spark.operators.kv import op_log, replay
from mapreduce_distributed_systems_spark.sources import load_table


def model_replay(ops: list[tuple[str, str, str]]) -> dict[str, str]:
    """(key, op, payload) in commit order — models/kv.go:40-54."""
    state: dict[str, str] = {}
    for key, op, payload in ops:
        if op == "put":
            state[key] = payload
        elif op == "append":
            state[key] = state.get(key, "") + payload
    return state


op_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k0", "k1", "k2"]),
        st.sampled_from(["put", "append", "get"]),
        st.text(alphabet="abcXYZ", min_size=0, max_size=3),
    ),
    min_size=0,
    max_size=40,
)


_spark_for_hypothesis = None


def _get_spark():
    global _spark_for_hypothesis
    if _spark_for_hypothesis is None:
        from mapreduce_distributed_systems_spark.session import get_spark

        _spark_for_hypothesis = get_spark("tests")
    return _spark_for_hypothesis


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=op_strategy)
def test_replay_matches_model(ops):
    spark = _get_spark()
    rows = [
        (i, key, op, payload, i)  # ts = event_id = i → total order
        for i, (key, op, payload) in enumerate(ops)
    ]
    df = spark.createDataFrame(
        rows, schema="ts long, key string, op string, payload string, event_id long"
    )
    got = {
        r["key"]: r["final_value"] for r in replay(df).collect()
    }
    want = {k: v for k, v in model_replay(ops).items()}
    # replay() only emits keys that received at least one write;
    # the model may hold '' entries from appends of empty payloads — keep both
    want = {k: v for k, v in want.items()}
    assert got == want


def test_stream_equals_batch(spark, sf_dir):
    from mapreduce_distributed_systems_spark.streaming.kv_stream import streamed_replay

    batch = replay(op_log(load_table(spark, sf_dir, "events")))
    stream = streamed_replay(spark, sf_dir)
    b = {(r["key"], r["final_value"], r["n_effective_ops"]) for r in batch.collect()}
    s = {(r["key"], r["final_value"], r["n_effective_ops"]) for r in stream.collect()}
    assert b == s


def test_snapshot_plus_incremental_equals_full_replay(spark, sf_dir):
    """C6 snapshot/compaction analogue: materialize state at a seq
    cutoff, replay only the tail on top of it, compare to full replay.
    Snapshot = 'put <state>' per key at the cutoff (models/kv.go last-put
    reset makes a snapshot exactly a synthetic Put)."""
    from pyspark.sql import functions as F

    ops = op_log(load_table(spark, sf_dir, "events")).where(F.col("op") != "get")
    cutoff = ops.select(F.expr("percentile(event_id, 0.5)").alias("c")).collect()[0].c

    head = ops.where(F.col("event_id") <= cutoff)
    tail = ops.where(F.col("event_id") > cutoff)

    snapshot = replay(head).select(
        F.col("key"),
        F.lit("put").alias("op"),
        F.col("final_value").alias("payload"),
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("ts"),  # before tail
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("client_id"),
        F.lit(None).cast("int").alias("client_seq"),
    )
    compacted = replay(snapshot.unionByName(tail.select(snapshot.columns)))
    full = replay(ops)

    got = {(r["key"], r["final_value"]) for r in compacted.collect()}
    want = {(r["key"], r["final_value"]) for r in full.collect()}
    assert got == want


def test_snapshot_compaction_invisible_at_any_cutoff(spark, sf_dir):
    """C6 contract: snapshot(prefix) + tail replay == full replay for
    ANY prefix cutoff of the total order (0%, 25%, 75%, 100%)."""
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.operators.kv import (
        compacted_replay,
        op_log,
        replay,
    )
    from mapreduce_distributed_systems_spark.sources import load_table

    ops = op_log(load_table(spark, sf_dir, "events"))
    full = {
        (r.key, r.final_value, r.n_effective_ops)
        for r in replay(ops).collect()
    }
    lo, hi = ops.agg(F.min("ts"), F.max("ts")).first()
    import datetime

    for frac in (0.0, 0.25, 0.75, 1.0):
        cutoff = lo + datetime.timedelta(seconds=(hi - lo).total_seconds() * frac)
        got = {
            (r.key, r.final_value, r.n_effective_ops)
            for r in compacted_replay(ops, F.col("ts") <= F.lit(cutoff)).collect()
        }
        assert got == full, f"compaction visible at cutoff frac={frac}"


def test_scd2_versions_partition_time_and_match_replay(spark, sf_dir):
    """SCD2 invariants: per key, validity intervals are contiguous and
    non-overlapping (each valid_to equals the next valid_from), there
    is exactly one current version, version count equals put count,
    and the current version's value is the base put that replay's
    final state starts with (appends extend it)."""
    from pyspark.sql import functions as F

    from mapreduce_distributed_systems_spark.plans.registry import get_spec

    rows = get_spec("kv_scd2_versions").fn(spark, sf_dir).collect()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    ops = op_log(load_table(spark, sf_dir, "events"))
    puts_per_key = {
        r.key: r.n
        for r in ops.where("op = 'put'").groupBy("key").agg(
            F.count("*").alias("n")
        ).collect()
    }
    final = {r.key: r.final_value for r in replay(ops).collect()}
    for key, vs in by_key.items():
        vs.sort(key=lambda r: r.version_no)
        assert [v.version_no for v in vs] == list(range(1, len(vs) + 1))
        assert len(vs) == puts_per_key[key]
        assert sum(1 for v in vs if v.is_current) == 1
        assert vs[-1].is_current and vs[-1].valid_to is None
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, (key, a.version_no)
            assert a.valid_from <= a.valid_to
        # replay semantics: final state = last put ++ later appends
        assert final[key].startswith(vs[-1].value), key


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=op_strategy)
def test_scd2_matches_sequential_model(ops):
    """SCD2 against the obvious sequential fold: replay the put
    stream in order; each put for a key closes the previous open
    interval at its timestamp and opens a new current one."""
    from mapreduce_distributed_systems_spark.operators.kv import scd2_versions

    spark = _get_spark()
    rows = [
        (i, key, op, payload, i)
        for i, (key, op, payload) in enumerate(ops)
    ]
    # sequential model over puts only
    model: dict[str, list] = {}
    for ts, key, op, payload, eid in rows:
        if op != "put":
            continue
        if model.get(key):
            model[key][-1][3] = ts  # close previous interval
        model.setdefault(key, []).append([len(model.get(key, [])) + 1
                                          if not model.get(key) else
                                          model[key][-1][0] + 1,
                                          payload, ts, None])
    df = spark.createDataFrame(
        rows, schema="ts long, key string, op string, payload string, event_id long"
    )
    got = sorted(
        (r.key, r.version_no, r.value, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_versions(df.where("op = 'put'")).collect()
    )
    want = sorted(
        (key, ver, val, vf, vt, vt is None)
        for key, versions in model.items()
        for ver, val, vf, vt in versions
    )
    assert got == want
