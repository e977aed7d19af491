"""bench.py child-process plumbing: the pure parsing contracts between the
parent and its metric subprocesses (--e2e-sub / --train-sub).

These are the round-4/5 diagnosability fixes (VERDICT r4 "what's weak" #1):
a timeout-killed child must yield WHICH phase hung, and the child's single
JSON stdout line must survive model-builder notices printed above it. No
JAX compute here — the spawning paths are exercised on-chip by driver runs
and in CPU smoke via HI3D_BENCH_SMOKE.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench  # noqa: E402


def test_phase_tail_picks_last_marks():
    err = (
        "WARNING: something\n"
        "[phase:stage1] add_custom_cond 0.75s\n"
        "noise in between\n"
        "[phase:stage1] conditioner 0.13s\n"
        "[phase:stage1] sampler_steps 9.57s\n"
        "[phase:stage1] vae_decode 0.82s\n"
        "[phase:stage1] to_host 0.64s\n"
    )
    tail = bench._phase_tail(err)
    # last 4 marks, joined in order — the kill diagnosis string
    assert tail.startswith("[phase:stage1] conditioner")
    assert tail.endswith("to_host 0.64s")
    assert tail.count("[phase") == 4


def test_phase_tail_bytes_and_empty():
    # subprocess.TimeoutExpired.stderr is bytes (capture not yet decoded)
    assert "compile 12.00s" in bench._phase_tail(
        b"[phase:train] compile 12.00s\n"
    )
    assert bench._phase_tail(None) == "no phase marks reached"
    assert bench._phase_tail("no marks here") == "no phase marks reached"


def test_last_json_line_skips_notices_and_partial_lines():
    stdout = (
        "embedder notice: random weights - smoke mode\n"
        '{"metric": "stale", "value": 1}\n'
        "{not json at all\n"
        '{"metric": "e2e_sec_per_asset_stage1", "value": 12.7}\n'
    )
    out = bench._last_json_line(stdout)
    assert out == {"metric": "e2e_sec_per_asset_stage1", "value": 12.7}
    assert bench._last_json_line("nothing parseable") is None
    assert bench._last_json_line("") is None
