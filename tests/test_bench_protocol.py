"""Bench driver-contract guard: the driver parses a bounded stdout
tail of `python bench.py` for ONE final JSON line with a fixed shape
(BENCH_r02.json recorded `parsed: null` when this drifted in round 2).
A broken protocol silently costs the round's metric, so pin it here.

Runs bench.py as a real subprocess at sf0.001 — its own SparkSession,
exactly the invocation the driver uses — so this also smoke-tests the
noop-sink execution path end to end. The committed sf0.1 io sidecar
is preserved across the run (bench.py always writes it next to
itself, by driver protocol).
"""

from __future__ import annotations

import pytest

# driver-budget profile (pytest.ini): bench-protocol end-to-end subprocess run (~6 min); the driver runs bench.py itself
pytestmark = pytest.mark.slow

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIDECAR = os.path.join(REPO, "BENCH_IO.json")


def test_bench_emits_parseable_final_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = env.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    original = None
    if os.path.exists(SIDECAR):
        with open(SIDECAR, "rb") as f:
            original = f.read()
    try:
        proc = subprocess.run(
            ["python", "bench.py"],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        with open(SIDECAR) as f:
            io = json.load(f)
    finally:
        if original is not None:
            with open(SIDECAR, "wb") as f:
                f.write(original)

    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing to stdout"
    # the LAST line, alone, must be the driver-contract JSON
    final = json.loads(lines[-1])
    assert final["metric"] == "headline_queries_total_wall"
    assert final["unit"] == "sec"
    assert isinstance(final["value"], (int, float)) and final["value"] > 0
    assert isinstance(final["queries"], dict) and len(final["queries"]) >= 20
    assert all(isinstance(v, (int, float)) for v in final["queries"].values())
    assert abs(sum(final["queries"].values()) - final["value"]) < 0.05
    # the io sidecar must cover the same query set with byte counters
    assert set(io["io"]) == set(final["queries"])
    for stats in io["io"].values():
        assert {"input_bytes", "shuffle_read_bytes", "shuffle_write_bytes"} <= set(
            stats
        )
    # round-6 measurement protocol (VERDICT r5 item 2): every reported
    # wall is the per-query MEDIAN over >= 3 rotated passes, so the
    # first-slot inflation cannot masquerade as a regression again
    import statistics

    assert set(io["passes"]) == set(final["queries"])
    for name, walls in io["passes"].items():
        assert len(walls) >= 3, f"{name}: {len(walls)} passes"
        assert final["queries"][name] == round(statistics.median(walls), 4)
    # load telemetry (VERDICT r11 item 1): the artifact itself must
    # carry what noise adjudication needs — loadavg at both ends, the
    # whole-run wall, and the wall-vs-reported factor — in BOTH the
    # final driver line and the sidecar, plus a per-query 1-min
    # loadavg snapshot in the io map
    for load in (final["load"], io["load"]):
        assert len(load["loadavg_start"]) == 3
        assert len(load["loadavg_end"]) == 3
        assert load["wall_sec"] > 0
        assert load["wall_vs_reported"] >= 1.0  # wall includes setup
    for stats in io["io"].values():
        assert isinstance(stats["loadavg_1m"], (int, float))
