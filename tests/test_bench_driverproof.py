"""bench.py must be driver-proof: the headline JSON line is printed and
flushed after the FIRST completed TPU leg, each leg runs under its own
wall-clock budget, and a stalled leg is skipped instead of sinking the whole
capture (VERDICT r3 item 1: BENCH_r02 rc=1 and BENCH_r03 rc=124 lost two
rounds of perf records to all-or-nothing output).

The tests run bench.py as a subprocess on CPU with a tiny workload and
inject stalls via the BENCH_SELFTEST_STALL hook."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(tmp_path, stall=None, stall_once=None, timeout=420):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_BATCH="2",
        BENCH_WIDTH="256",
        BENCH_LABELS="64",
        BENCH_STEPS="2",
        BENCH_TRIALS="1",
        BENCH_LEG_BUDGET="120",
        BENCH_DEADLINE="300",
        BENCH_DETAILS_PATH=str(tmp_path / "details.json"),
        BENCH_STORE_LINES="8",
        BENCH_E2E_STEPS="3",
        BENCH_DATA_DIR=str(tmp_path / "bench_data"),
    )
    if stall:
        env["BENCH_SELFTEST_STALL"] = stall
    if stall_once:
        env["BENCH_SELFTEST_STALL_ONCE"] = stall_once
    # run from tmp_path so DETAILS/BASELINE writes land in the repo as usual
    # but the .bench_data store build (slow render) is what the real_data leg
    # budget covers; with the 6s budget it will be skipped — which is the point.
    proc = subprocess.run(
        [sys.executable, BENCH],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    return proc


def _last_json_line(stdout: str):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip().startswith("{")]
    assert lines, f"no JSON line in stdout: {stdout!r}"
    return json.loads(lines[-1])


@pytest.mark.slow
def test_stalled_leg_does_not_sink_the_bench(tmp_path):
    """Stall the scan_fused leg: the device_resident line already emitted
    must survive as the parseable tail, and the process must exit 0."""
    proc = _run_bench(tmp_path, stall="scan_fused")
    assert proc.returncode == 0, proc.stderr[-2000:]
    parsed = _last_json_line(proc.stdout)
    assert parsed["metric"] == "pretraining_throughput"
    assert parsed["value"] > 0
    assert parsed["unit"] == "text-lines/sec/chip"
    assert parsed["vs_baseline"] is None or parsed["vs_baseline"] > 0
    details = json.load(open(tmp_path / "details.json"))
    assert "scan_fused" in details.get("skipped", [])


@pytest.mark.slow
def test_build_leg_retries_after_blown_handshake_budget(tmp_path):
    """The r4 driver failure, reproduced by the judge: the relay's first-D2H
    handshake blocked past the build budget in a C call; when it returned,
    the pending SIGALRM raised LegTimeout and bench discarded a fully-built,
    channel-warm trainer and exited 1. Simulate with BENCH_SELFTEST_STALL_ONCE:
    the first build attempt blocks ~2x its budget, and the in-leg retry must
    still produce a parsed headline line and exit 0."""
    proc = _run_bench(tmp_path, stall_once="build")
    assert proc.returncode == 0, proc.stderr[-2000:]
    parsed = _last_json_line(proc.stdout)
    assert parsed["metric"] == "pretraining_throughput"
    assert parsed["value"] > 0
    details = json.load(open(tmp_path / "details.json"))
    assert "build" in details.get("retried", []), details
    assert "build" not in details.get("skipped", []), details
    assert details.get("device_resident_lines_per_sec", 0) > 0


@pytest.mark.slow
def test_details_merge_preserves_previous_capture(tmp_path):
    """A degraded run must not clobber measurement keys from a prior capture:
    they are carried under `previous` (advisor r4: the r4 build failure wiped
    the r3 numbers docs/SCALING.md cites)."""
    (tmp_path / "details.json").write_text(
        json.dumps({"scan_fused_lines_per_sec": 1234.5, "stale_only_key": 7})
    )
    proc = _run_bench(tmp_path, stall="real_data")
    assert proc.returncode == 0, proc.stderr[-2000:]
    details = json.load(open(tmp_path / "details.json"))
    # fresh keys win at top level; keys this run didn't produce are carried
    assert details.get("scan_fused_lines_per_sec", 0) != 1234.5
    assert details["previous"]["stale_only_key"] == 7


@pytest.mark.slow
def test_stalled_real_data_leg_keeps_tpu_numbers(tmp_path):
    """Stall the real_data leg (the r3 suspect — store build + 100-step e2e):
    all TPU legs must still land and the line must parse."""
    proc = _run_bench(tmp_path, stall="real_data")
    assert proc.returncode == 0, proc.stderr[-2000:]
    parsed = _last_json_line(proc.stdout)
    assert parsed["value"] > 0
    details = json.load(open(tmp_path / "details.json"))
    assert details.get("device_resident_lines_per_sec", 0) > 0
    assert "real_data" in details.get("skipped", [])
