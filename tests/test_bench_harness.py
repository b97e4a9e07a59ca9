"""Two-pass bench harness self-test (no TPU, no kernels).

The bench harness is the round's primary evidence channel (three rounds
of driver rc=124 kills — VERDICT r3/r4 item 1): its scheduling,
streaming, retry, and error-row paths must be verifiable without
hardware. BENCH_FAKE_SPEC (bench.py) swaps the workload table for
synthetic workloads; this test drives one full two-pass run through the
real subprocess machinery and checks every evidence guarantee:

- pass 1 emits a provisional row for EVERY workload before pass 2
  starts (a kill costs precision, never coverage);
- pass 2 re-emits precise rows that supersede the provisional ones;
- a workload that raises yields a recorded error row, not silence;
- a workload that fails AFTER emitting a good row still gets its error
  row recorded (ADVICE r4 medium: partial failure != full success);
- every row also lands in the BENCH_SINK jsonl file.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


@pytest.fixture(scope="module")
def harness_run(tmp_path_factory):
    sink = str(tmp_path_factory.mktemp("bench") / "sink.jsonl")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_FAKE_SPEC="wa=ok:0,wb=partial:0,wc=raise:0",
        BENCH_TOTAL_BUDGET_SECS="600",
        BENCH_CHEAP_CAP="120",
        BENCH_WORKLOAD_TIMEOUT="120",
        BENCH_MIN_USEFUL_SECS="5",
        BENCH_RESERVE_SECS="5",
        BENCH_INIT_RETRIES="0",
        BENCH_SINK=sink,
    )
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=540,
    )
    rows = [json.loads(s) for s in proc.stdout.splitlines()
            if s.strip().startswith("{") and '"metric"' in s]
    return proc, rows, sink


def test_exit_clean(harness_run):
    proc, _, _ = harness_run
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]


def test_pass1_covers_every_workload_first(harness_run):
    _, rows, _ = harness_run
    prov = [r["metric"] for r in rows if r.get("provisional")]
    # every fake workload that can emit does so provisionally in pass 1
    assert prov.count("wa") == 1 and prov.count("wb") == 1
    # ...and all provisional rows precede every precise metric row —
    # a kill between the passes still leaves full coverage behind
    first_precise = min(i for i, r in enumerate(rows)
                        if not r.get("provisional")
                        and "error" not in r)
    last_prov = max(i for i, r in enumerate(rows)
                    if r.get("provisional"))
    assert last_prov < first_precise


def test_pass2_supersedes(harness_run):
    _, rows, _ = harness_run
    precise = [r for r in rows
               if not r.get("provisional") and "error" not in r]
    assert {"wa", "wb"} <= {r["metric"] for r in precise}


def test_raise_yields_error_row(harness_run):
    _, rows, _ = harness_run
    errs = [r for r in rows
            if r["metric"] == "wc" and "error" in r]
    assert errs, "raising workload must record an error row"
    assert "fake workload failure" in errs[-1]["error"]


def test_partial_failure_recorded(harness_run):
    _, rows, _ = harness_run
    # wb emitted a good row AND a trailing error row; both must survive
    goods = [r for r in rows
             if r["metric"] == "wb" and "error" not in r]
    errs = [r for r in rows
            if r["metric"] == "wb_tail" and "error" in r]
    assert goods, "wb's good row lost"
    assert errs, ("wb's trailing error row lost — partial failure "
                  "read as full success (ADVICE r4 medium)")


def test_sink_mirrors_rows(harness_run):
    _, rows, sink = harness_run
    with open(sink) as f:
        sink_rows = [json.loads(s) for s in f if s.strip()]
    sunk = {(r["metric"], bool(r.get("provisional")))
            for r in sink_rows if "error" not in r}
    assert ("wa", True) in sunk and ("wa", False) in sunk
