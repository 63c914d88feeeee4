"""Kernel-gate auto-enable (sot_tpu/kernel_gates.py): bench.py, the profile
script, and `cli train --kernels auto` all pick the shipped kernel config
through this logic unattended, so it must be regression-tested: committed
A/B winners enabled, explicit env precedence, best-of-N for the MSS
variants, errored/losing candidates stay off."""

import importlib.util
import json
import os

import pytest

from sot_tpu.kernel_gates import auto_gates


@pytest.fixture(autouse=True)
def _tmp_results(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "results" / "round2").mkdir(parents=True)


def _write(name, payload):
    with open(os.path.join("results", "round2", name), "w") as fh:
        json.dump(payload, fh)


def test_no_ab_files_no_gates():
    assert auto_gates() == {}


def test_winner_enabled_with_merge_rows():
    # without a committed training verdict, a merge A/B win enables the
    # HYBRID mode (reference-convention gradients), never 'full'
    _write("sot_ab.json", {"plane": {"fwd_ms": 2.0, "grad_ms": 3.0},
                           "merge": {"fwd_ms": 1.0, "grad_ms": 1.0,
                                     "rows": 64}})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "hybrid",
                            "SOT_TPU_MERGE_ROWS": "64"}


def test_full_merge_needs_training_verdict():
    _write("sot_ab.json", {"plane": {"fwd_ms": 2.0, "grad_ms": 3.0},
                           "merge": {"fwd_ms": 1.0, "grad_ms": 1.0}})
    _write("merge_train_verdict.json", {"full_ok": False})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "hybrid"}
    _write("merge_train_verdict.json", {"full_ok": True})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "1"}


def test_refgrad_upgrade_needs_parity_and_margin():
    # a merge A/B win normally lands on 'hybrid'; a complete refgrad A/B
    # with on-chip parity AND the standard speed margin upgrades to 'ref'
    _write("sot_ab.json", {"plane": {"fwd_ms": 2.4, "grad_ms": 3.8},
                           "merge": {"fwd_ms": 0.4, "grad_ms": 0.9}})
    _write("refgrad_ab.json", {
        "complete": True, "parity": {"max_rel": 2e-6, "ok": True},
        "hybrid": {"fwd_ms": 0.43, "grad_ms": 3.8},
        "ref": {"fwd_ms": 0.43, "grad_ms": 1.5}})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "ref"}
    # parity failure -> stay on hybrid no matter the speed
    _write("refgrad_ab.json", {
        "complete": True, "parity": {"max_rel": 0.2, "ok": False},
        "hybrid": {"fwd_ms": 0.43, "grad_ms": 3.8},
        "ref": {"fwd_ms": 0.43, "grad_ms": 1.5}})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "hybrid"}
    # incomplete (timeout mid-variant) -> hybrid
    _write("refgrad_ab.json", {
        "parity": {"max_rel": 2e-6, "ok": True},
        "hybrid": {"fwd_ms": 0.43, "grad_ms": 3.8},
        "ref": {"fwd_ms": 0.43, "grad_ms": 1.5}})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "hybrid"}
    # ref slower than hybrid -> hybrid
    _write("refgrad_ab.json", {
        "complete": True, "parity": {"max_rel": 2e-6, "ok": True},
        "hybrid": {"fwd_ms": 0.43, "grad_ms": 3.8},
        "ref": {"fwd_ms": 0.43, "grad_ms": 4.5}})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "hybrid"}
    # a blessed FULL verdict outranks the ref upgrade (full is faster)
    _write("refgrad_ab.json", {
        "complete": True, "parity": {"max_rel": 2e-6, "ok": True},
        "hybrid": {"fwd_ms": 0.43, "grad_ms": 3.8},
        "ref": {"fwd_ms": 0.43, "grad_ms": 1.5}})
    _write("merge_train_verdict.json", {"full_ok": True})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "1"}


def test_loser_and_errored_candidates_stay_off():
    _write("sot_ab.json", {"plane": {"fwd_ms": 1.0, "grad_ms": 1.0},
                           "merge": {"fwd_ms": 2.0, "grad_ms": 2.0}})
    _write("conv_ab.json", {"xla": {"fwd_ms": 1.0, "grad_ms": 1.0},
                            "pallas": {"error": "Mosaic rejected"}})
    assert auto_gates() == {}


def test_mss_best_of_three_variants():
    _write("mss_ab.json", {
        "fft": {"fwd_ms": 1.0, "grad_ms": 1.0},
        "dft_matmul": {"fwd_ms": 0.8, "grad_ms": 0.9},
        "pallas": {"fwd_ms": 0.7, "grad_ms": 0.8},
        "pallas+dft": {"fwd_ms": 0.6, "grad_ms": 0.7}})
    assert auto_gates() == {"SOT_TPU_STFT_PALLAS": "1",
                            "SOT_TPU_DFT_MATMUL": "1"}


def test_mss_near_tie_keeps_baseline():
    # <3% win is within bench noise: stay on the default path
    _write("mss_ab.json", {
        "fft": {"fwd_ms": 1.0, "grad_ms": 1.0},
        "dft_matmul": {"fwd_ms": 0.99, "grad_ms": 0.99}})
    assert auto_gates() == {}


def test_us_scale_relative_win_is_noise():
    # a big RELATIVE win on a µs-scale path (the real round-3 mss_ab:
    # fft 0.006+0.005 vs dft 0.005+0.005) is below the 0.05 ms absolute
    # floor — a gate flip must be worth real step time
    _write("mss_ab.json", {
        "fft": {"fwd_ms": 0.006, "grad_ms": 0.005},
        "dft_matmul": {"fwd_ms": 0.005, "grad_ms": 0.005}})
    assert auto_gates() == {}


def test_explicit_env_wins(monkeypatch):
    _write("mss_ab.json", {
        "fft": {"fwd_ms": 1.0, "grad_ms": 1.0},
        "dft_matmul": {"fwd_ms": 0.5, "grad_ms": 0.5},
        "pallas": {"fwd_ms": 0.2, "grad_ms": 0.2},
        "pallas+dft": {"fwd_ms": 0.1, "grad_ms": 0.1}})
    # user pinned the DFT gate (off or on — either way it is theirs):
    # candidates touching it are excluded, best remaining still wins
    monkeypatch.setenv("SOT_TPU_DFT_MATMUL", "")
    assert auto_gates() == {"SOT_TPU_STFT_PALLAS": "1"}
    monkeypatch.setenv("SOT_TPU_STFT_PALLAS", "")
    assert auto_gates() == {}


def test_bench_delegates_to_kernel_gates():
    _write("sot_ab.json", {"plane": {"fwd_ms": 2.0, "grad_ms": 3.0},
                           "merge": {"fwd_ms": 1.0, "grad_ms": 1.0}})
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._auto_gates() == {"SOT_TPU_W2_MERGE": "hybrid"}


def test_small_shape_mode_hybrid_when_512_ab_flips():
    # round-4: per-shape gating — at [rows x 257] hybrid beats ref, so a
    # ref main gate gains SOT_TPU_W2_MERGE_SMALL=hybrid
    _write("sot_ab.json", {"plane": {"fwd_ms": 2.4, "grad_ms": 3.8},
                           "merge": {"fwd_ms": 0.4, "grad_ms": 0.9,
                                     "rows": 128}})
    _write("refgrad_ab.json", {
        "complete": True, "parity": {"max_rel": 0.0, "ok": True},
        "hybrid": {"fwd_ms": 0.43, "grad_ms": 3.8},
        "ref": {"fwd_ms": 0.43, "grad_ms": 1.5}})
    _write("refgrad_ab_512.json", {
        "complete": True, "parity": {"max_rel": 0.0, "ok": True},
        "hybrid": {"fwd_ms": 0.25, "grad_ms": 0.32},
        "ref": {"fwd_ms": 0.21, "grad_ms": 0.42}})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "ref",
                            "SOT_TPU_MERGE_ROWS": "128",
                            "SOT_TPU_W2_MERGE_SMALL": "hybrid"}


def test_small_shape_mode_absent_when_within_noise():
    _write("sot_ab.json", {"plane": {"fwd_ms": 2.4, "grad_ms": 3.8},
                           "merge": {"fwd_ms": 0.4, "grad_ms": 0.9}})
    _write("refgrad_ab.json", {
        "complete": True, "parity": {"max_rel": 0.0, "ok": True},
        "hybrid": {"fwd_ms": 0.43, "grad_ms": 3.8},
        "ref": {"fwd_ms": 0.43, "grad_ms": 1.5}})
    _write("refgrad_ab_512.json", {
        "complete": True, "parity": {"max_rel": 0.0, "ok": True},
        "hybrid": {"fwd_ms": 0.30, "grad_ms": 0.30},
        "ref": {"fwd_ms": 0.30, "grad_ms": 0.31}})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "ref"}


def test_refgrad_training_verdict_demotes_ref():
    # round-4: a committed NEGATIVE training verdict outranks parity+speed
    _write("sot_ab.json", {"plane": {"fwd_ms": 2.4, "grad_ms": 3.8},
                           "merge": {"fwd_ms": 0.4, "grad_ms": 0.9}})
    _write("refgrad_ab.json", {
        "complete": True, "parity": {"max_rel": 0.0, "ok": True},
        "hybrid": {"fwd_ms": 0.43, "grad_ms": 3.8},
        "ref": {"fwd_ms": 0.43, "grad_ms": 1.5}})
    _write("refgrad_train_verdict.json", {"ref_ok": False})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "hybrid"}
    _write("refgrad_train_verdict.json", {"ref_ok": True})
    assert auto_gates() == {"SOT_TPU_W2_MERGE": "ref"}


def test_cqt_gate_requires_parity():
    _write("cqt_ab.json", {
        "complete": True, "parity": {"rel_sum_diff": 1e-5, "ok": True},
        "xla": {"fwd_ms": 1.0, "grad_ms": 0.0},
        "pallas": {"fwd_ms": 0.3, "grad_ms": 0.0}})
    assert auto_gates() == {"SOT_TPU_CQT_PALLAS": "1"}
    _write("cqt_ab.json", {
        "complete": True, "parity": {"rel_sum_diff": 0.3, "ok": False},
        "xla": {"fwd_ms": 1.0, "grad_ms": 0.0},
        "pallas": {"fwd_ms": 0.3, "grad_ms": 0.0}})
    assert auto_gates() == {}


def test_synth_gate_needs_parity_speed_and_training_verdict():
    ab = {"complete": True,
          "parity": {"val_max_rel": 3e-3, "damp_max_rel": 1e-2,
                     "dfreq_max_rel": 1.2e-2, "ok": True},
          "xla": {"fwd_ms": 1.16, "grad_ms": 2.73},
          "pallas": {"fwd_ms": 0.61, "grad_ms": 1.04}}
    _write("synth_ab.json", ab)
    # A/B alone is NOT enough: fp-noise parity requires training evidence
    assert "SOT_TPU_SYNTH_PALLAS" not in auto_gates()
    _write("synth_train_verdict.json", {"synth_ok": False})
    assert "SOT_TPU_SYNTH_PALLAS" not in auto_gates()
    _write("synth_train_verdict.json", {"synth_ok": True})
    assert auto_gates().get("SOT_TPU_SYNTH_PALLAS") == "1"
    # parity failure kills it even with a verdict
    ab["parity"]["ok"] = False
    _write("synth_ab.json", ab)
    assert "SOT_TPU_SYNTH_PALLAS" not in auto_gates()


def test_convbf16_gate_needs_verdict_and_bench_win():
    assert "SOT_TPU_CONV_BF16" not in auto_gates()
    _write("convbf16_train_verdict.json", {
        "conv_bf16_ok": True,
        "bench_frames_per_sec": {"off": 129434.3, "on": 138150.5}})
    assert auto_gates().get("SOT_TPU_CONV_BF16") == "1"
    _write("convbf16_train_verdict.json", {
        "conv_bf16_ok": False,
        "bench_frames_per_sec": {"off": 129434.3, "on": 138150.5}})
    assert "SOT_TPU_CONV_BF16" not in auto_gates()
    _write("convbf16_train_verdict.json", {
        "conv_bf16_ok": True,
        "bench_frames_per_sec": {"off": 129434.3, "on": 131000.0}})
    assert "SOT_TPU_CONV_BF16" not in auto_gates()  # <3% win
