"""bench.py main() budget/priority flow, with every metric faked.

The budget plan is the most round-critical logic in the repo — rounds 3/4
lost driver records to it (VERDICT r3/r4 missing #1), and it only ever runs
on the real chip, where a regression costs a whole round to discover. These
tests simulate budget consumption by moving bench._DEADLINE and assert the
documented contract: execution order train → e2e1 → stage2 → e2e2 with
priority-preserving reservations, capped train child, skip entries that
carry diagnoses, and a projection derived from measured phase rows (or
labeled fallbacks).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench  # noqa: E402

PH1 = {"add_custom_cond": 0.62, "conditioner": 0.06, "sampler_steps": 9.53,
       "vae_decode": 0.82, "to_host": 0.56}
PH2 = {"add_custom_cond": 3.1, "conditioner": 0.86, "vae_encode": 0.73,
       "sampler_steps": 21.63, "vae_decode": 1.52, "to_host": 2.31}


class Driver:
    """Installs fakes for every metric producer; records the call order and
    simulates each metric's wall cost by advancing bench's deadline."""

    def __init__(self, monkeypatch, budget, *, train_out=None,
                 e2e_outs=None, costs=None):
        self.calls = []
        self.train_caps = []
        self.costs = costs or {}
        self.train_out = train_out or {
            "metric": "train_steps_per_sec_chip_stage1_512_svd_adapt",
            "value": 1.33, "unit": "steps/sec/chip", "sec_per_step": 0.753,
        }
        # per-stage lists of results; each call pops the next one
        self.e2e_outs = {k: list(v) for k, v in (e2e_outs or {}).items()}
        monkeypatch.setattr(bench, "_backend_reachable", lambda **kw: True)
        monkeypatch.setattr(bench, "_peak_flops_per_sec", lambda: 197e12)
        monkeypatch.setattr(bench, "_bench_denoise", self._denoise)
        monkeypatch.setattr(bench, "_run_bench_child", self._child)
        monkeypatch.setattr(bench, "_e2e_subprocess", self._e2e)
        monkeypatch.setattr(
            bench, "_DEADLINE", bench.time.monotonic() + budget
        )

    def _spend(self, key, default):
        bench._DEADLINE -= self.costs.get(key, default)

    def _denoise(self, metric, in_ch, adm, hw, peak, **kw):
        stage = "primary" if "stage1" in metric else "s2"
        self.calls.append(stage)
        self._spend(stage, 40.0)
        return {"metric": metric, "value": 2.57 if stage == "primary" else
                0.46, "unit": "steps/sec/chip",
                "sec_per_step": 0.389 if stage == "primary" else 2.174}

    def _child(self, sub_args, label, budget_cap=None):
        assert sub_args == ["--train-sub"], "only train uses _run_bench_child"
        self.calls.append("train")
        self.train_caps.append(budget_cap)
        self._spend("train", 75.0)
        return dict(self.train_out), ""

    def _e2e(self, stage, step_sec, budget_cap=None):
        self.calls.append(f"e2e{stage}")
        self._spend(f"e2e{stage}", 92.0 if stage == 1 else 136.0)
        outs = self.e2e_outs.get(stage)
        if outs:
            return dict(outs.pop(0))
        return {"metric": f"e2e_sec_per_asset_stage{stage}",
                "value": 11.6 if stage == 1 else 30.2, "unit": "sec/asset",
                "num_steps": 25 if stage == 1 else 10,
                "phases": dict(PH1 if stage == 1 else PH2)}


def run_main(capsys):
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def by_metric(rec):
    return {m["metric"]: m for m in rec.get("extra", [])}


def test_warm_run_lands_all_five_plus_projection(monkeypatch, capsys):
    d = Driver(monkeypatch, 540)
    rec = run_main(capsys)
    assert d.calls == ["primary", "train", "e2e1", "s2", "e2e2"]
    got = by_metric(rec)
    assert {"train_steps_per_sec_chip_stage1_512_svd_adapt",
            "e2e_sec_per_asset_stage1",
            "unet_denoise_steps_per_sec_chip_stage2_1024",
            "e2e_sec_per_asset_stage2",
            "projected_v5e8_two_stage_sec_per_asset"} <= set(got)
    assert "skipped" not in rec
    # train child cap: min(140, remaining-140); remaining was 540-40=500
    assert d.train_caps == [140.0]
    proj = got["projected_v5e8_two_stage_sec_per_asset"]
    # e2e2 ran at 10 steps — its sampler row scales to 25 before the /8
    scale8 = {"sampler_steps", "conditioner", "vae_encode", "vae_decode"}
    ph2_sampler = PH2["sampler_steps"] * 2.5
    expect = sum(
        v / (8.0 if k in scale8 else 1.0) for k, v in PH1.items()
    ) + sum(
        v / (8.0 if k in scale8 else 1.0)
        for k, v in {**PH2, "sampler_steps": ph2_sampler}.items()
    )
    assert proj["value"] == pytest.approx(expect, abs=0.06)
    assert "fallback" not in proj["assumptions"]


def test_tight_budget_preserves_e2e1_over_train(monkeypatch, capsys):
    # after the 40 s primary, 160 s remain: train's gate (remaining >
    # 75+140) fails, e2e1's 140 s floor holds — the PRIORITY order wins
    # even though train executes first
    d = Driver(monkeypatch, 200)
    rec = run_main(capsys)
    assert d.calls == ["primary", "e2e1"]
    got = by_metric(rec)
    assert "e2e_sec_per_asset_stage1" in got
    sk = "; ".join(rec["skipped"])
    assert "train: budget" in sk and "stage2: budget" in sk \
        and "e2e_stage2: budget" in sk
    # projection still emitted, from labeled fallback rows for stage 2
    proj = got["projected_v5e8_two_stage_sec_per_asset"]
    assert "fallback" in proj["assumptions"]
    assert "stage2" in proj["assumptions"]


def test_train_cap_shrinks_toward_e2e1_reservation(monkeypatch, capsys):
    # 260 s after primary: gate passes (260 > 245) and the cap is
    # remaining-170 = 90 < TRAIN_CAP — e2e1's 140 s floor survives even a
    # kill at cap + the 30 s grace (the grace comes out of the cap)
    d = Driver(monkeypatch, 300)
    run_main(capsys)
    assert d.train_caps == [pytest.approx(90.0, abs=1.0)]
    cap = d.train_caps[0]
    assert 260 - (cap + 30.0) >= 140.0


def test_train_child_failure_is_diagnosed_not_fatal(monkeypatch, capsys):
    d = Driver(
        monkeypatch, 540,
        train_out={"error": "train subprocess past 170 s budget — killed; "
                            "child phases: [phase:train] compile 168.21s"},
    )
    rec = run_main(capsys)
    assert d.calls == ["primary", "train", "e2e1", "s2", "e2e2"]
    sk = "; ".join(rec["skipped"])
    assert "train:" in sk and "compile 168.21s" in sk
    assert "train_steps_per_sec_chip_stage1_512_svd_adapt" not in by_metric(rec)


def test_e2e1_failure_retries_then_carries_diagnosis(monkeypatch, capsys):
    fail = {"error": "rc=1: UNAVAILABLE: TPU device error"}
    d = Driver(monkeypatch, 700, e2e_outs={1: [fail, fail]})
    rec = run_main(capsys)
    # two e2e1 attempts, then flow continues to stage2/e2e2
    assert d.calls == ["primary", "train", "e2e1", "e2e1", "s2", "e2e2"]
    attempts = [s for s in rec["skipped"] if s.startswith("e2e_stage1")]
    assert len(attempts) == 2
    assert "UNAVAILABLE" in attempts[0]
    # e2e2 ran and is in extras; projection labels stage1 fallback rows
    got = by_metric(rec)
    assert "e2e_sec_per_asset_stage2" in got
    assert "stage1" in got["projected_v5e8_two_stage_sec_per_asset"][
        "assumptions"]


def test_e2e2_no_retry(monkeypatch, capsys):
    fail = {"error": "e2e stage 2 subprocess past 200 s budget — killed; "
                     "child phases: [phase:stage2] sampler_steps 180.00s"}
    d = Driver(monkeypatch, 700, e2e_outs={2: [fail, fail]})
    rec = run_main(capsys)
    assert d.calls.count("e2e2") == 1
    assert any("sampler_steps 180.00s" in s for s in rec["skipped"])


def test_env_gate_disables_e2e_children(monkeypatch, capsys):
    monkeypatch.setenv("HI3D_BENCH_E2E", "0")
    d = Driver(monkeypatch, 540)
    rec = run_main(capsys)
    assert d.calls == ["primary", "train", "s2"]
    assert all(not c.startswith("e2e") for c in d.calls)
    # both e2e skips recorded; projection from labeled fallbacks, its
    # dominant rows refreshed from THIS run's measured step rates
    sk = "; ".join(rec["skipped"])
    assert "e2e_stage1" in sk and "e2e_stage2" in sk
    proj = by_metric(rec)["projected_v5e8_two_stage_sec_per_asset"]
    assert "stage1,stage2" in proj["assumptions"]
    assert proj["phase_rows"]["stage1"]["sampler_steps"] == pytest.approx(
        25 * 0.389, abs=0.05
    )
