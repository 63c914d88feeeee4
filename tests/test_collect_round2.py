"""scripts/collect_round2.py assembles the judge-facing paper tables
(mean/std columns, outage fallbacks, provisional cells, collapse rate) —
regression-test it on a fabricated runs/results tree."""

import importlib.util
import json
import os
import sys

import pytest


def _metrics(rpa, lsd=30.0):
    return {"test_metrics": {
        "raw_pitch_accuracy": rpa, "raw_chroma_accuracy": rpa,
        "octave_difference": 0.0, "log_spectral_distance": lsd,
        "mse": 0.1, "mss": 5.0}}


@pytest.fixture()
def tree(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "results" / "round1").mkdir(parents=True)
    (tmp_path / "results" / "round2").mkdir(parents=True)
    # round-1 artifacts the collector reuses
    r1 = [{"experiment": "SOT-2048", "run": f"s{s}", "RPA": rpa,
           "RCA": rpa, "OD": 0.0, "LSD": 40.0}
          for s, rpa in ((42, 60.0), (123, 62.0), (456, 58.0),
                         (789, 23.0), (101112, 0.1))]
    json.dump(r1, open("results/round1/synthetic_results_best-lsd.json", "w"))
    json.dump({"SOT-NoCut": {"raw_pitch_accuracy": 0.64,
                             "raw_chroma_accuracy": 0.65,
                             "log_spectral_distance": 19.9, "mss": 5.0,
                             "mse": 0.1, "octave_difference": 0.2}},
              open("results/round1/family_sweep.json", "w"))
    # a completed round-2 run pair for SOT-512 seed 42
    for sub, fname, rpa in (("ref", "test_metrics.json", 0.1),
                            ("best", "test_metrics_comb.json", 0.98)):
        d = tmp_path / "runs" / "round2" / sub / "SOT-512-42"
        d.mkdir(parents=True)
        json.dump(_metrics(rpa), open(d / fname, "w"))
    # a provisional CPU-eval cell
    d = tmp_path / "runs" / "round2" / "provisional" / "SOT-2048-SS-42"
    d.mkdir(parents=True)
    json.dump(_metrics(0.9), open(d / "test_metrics_comb.json", "w"))
    (d / "source_ckpt.txt").write_text("ckpt-40k (PROVISIONAL)")
    # collapse-rate extras
    d = tmp_path / "runs" / "round2" / "refextra" / "SOT-2048-7"
    d.mkdir(parents=True)
    json.dump(_metrics(0.05), open(d / "test_metrics.json", "w"))
    return tmp_path


def _run_collector():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "collect_round2", os.path.join(repo, "scripts", "collect_round2.py"))
    mod = importlib.util.module_from_spec(spec)
    argv = sys.argv
    sys.argv = ["collect_round2.py"]
    try:
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = argv
    return json.load(open("results/round2/synthetic_results_paper_best-lsd.json"))


def test_collector_tables_fallbacks_and_provisional(tree):
    out = _run_collector()

    # column A: SOT-2048 reused from round 1 (5 seeds), SOT-512 from the
    # one finished round-2 run
    a = out["reference_protocol"]
    assert abs(a["SOT-2048"]["RPA"]["mean"] - 40.62) < 0.1
    assert a["SOT-512"]["RPA"]["mean"] == pytest.approx(10.0)

    # column B: the comb-corrected best-recipe run
    assert out["best_recipe"]["SOT-512"]["RPA"]["mean"] == pytest.approx(98.0)

    # families with no round-2 rows fall back to round-1 seed 42 —
    # clearly separated, never mixed into the mean/std tables
    assert "SOT-NoCut" in out["round1_seed42_fallback"]
    assert "SOT-NoCut" not in a

    # provisional CPU-eval cells carry their source and stay separate
    prov = out["provisional_best_recipe"]["SOT-2048-SS-42"]
    assert prov["RPA"] == pytest.approx(90.0)
    assert "PROVISIONAL" in prov["source"]
    assert "SOT-2048-SS" not in out["best_recipe"]

    # the queue debt is enumerated
    assert any("MSS-Lin" in m for m in out["missing_runs"])

    # collapse addendum merges round-1 seeds + refextra runs
    col = json.load(open("results/round2/sot2048_collapse.json"))
    assert col["n_seeds"] == 6
    assert col["frac_below_20"] == pytest.approx(2 / 6)  # 0.1, 5.0 < 20
    assert col["frac_below_50"] == pytest.approx(3 / 6)  # + the 23.0 seed


def _write_run(root, sub, name, rpa, variants=("plain", "comb")):
    d = root / "runs" / "round2" / sub / name
    d.mkdir(parents=True, exist_ok=True)
    fnames = {"plain": "test_metrics.json", "comb": "test_metrics_comb.json",
              "octcorr": "test_metrics_octcorr.json"}
    for v in variants:
        json.dump(_metrics(rpa), open(d / fnames[v], "w"))


def test_resolve_auto_and_seed_honesty(tree):
    """VERDICT r4 task 8: the 'auto' column-B resolution must report tuned
    runs ONLY when all 5 seeds completed AND their mean beats ref+comb, and
    no table row may silently drop a seed (aggregate n + missing_runs)."""
    seeds = (42, 123, 456, 789, 101112)

    # SOT-512-LogF: complete tuned runs that beat ref -> 'best'
    for s in seeds:
        _write_run(tree, "ref", f"SOT-512-LogF-{s}", 0.30)
        _write_run(tree, "best", f"SOT-512-LogF-{s}", 0.90)
    # SOT-NoCut: tuned runs INCOMPLETE (4/5) despite winning scores -> 'ref'
    for s in seeds:
        _write_run(tree, "ref", f"SOT-NoCut-{s}", 0.50)
    for s in seeds[:-1]:
        _write_run(tree, "best", f"SOT-NoCut-{s}", 0.99)
    # MSS-Lin: tuned runs complete but WORSE -> 'ref'
    for s in seeds:
        _write_run(tree, "ref", f"MSS-Lin-{s}", 0.40)
        _write_run(tree, "best", f"MSS-Lin-{s}", 0.10)
    # SOT-2048: full six-gate refresh present -> column A uses run dirs,
    # not the round-1 JSON (rpa 0.70 vs round-1 ~40.6 mean)
    for s in seeds:
        _write_run(tree, "ref", f"SOT-2048-{s}", 0.70)
    # MSS-LogLin: one seed missing from ref -> honest n=4 + missing_runs
    for s in seeds[:-1]:
        _write_run(tree, "ref", f"MSS-LogLin-{s}", 0.20)

    out = _run_collector()

    assert out["recipe_map"]["SOT-512-LogF"] == "best+comb"
    assert out["best_recipe"]["SOT-512-LogF"]["RPA"]["mean"] == pytest.approx(90.0)
    # incomplete tuned runs are never reported as best-known
    assert out["recipe_map"]["SOT-NoCut"] == "ref+comb"
    assert out["best_recipe"]["SOT-NoCut"]["RPA"]["mean"] == pytest.approx(50.0)
    # complete-but-losing tuned runs are never reported as best-known
    assert out["recipe_map"]["MSS-Lin"] == "ref+comb"
    assert out["best_recipe"]["MSS-Lin"]["RPA"]["mean"] == pytest.approx(40.0)
    # refreshed SOT-2048 column A comes from the run dirs
    assert out["reference_protocol"]["SOT-2048"]["RPA"]["mean"] == pytest.approx(70.0)
    assert out["reference_protocol"]["SOT-2048"]["RPA"]["n"] == 5
    # no silent seed drops: n carries the truth and the gap is enumerated
    assert out["reference_protocol"]["MSS-LogLin"]["RPA"]["n"] == 4
    assert "ref/MSS-LogLin-101112" in out["missing_runs"]
