"""Octave-correction threshold sensitivity sweep (VERDICT round-1 item 5).

For each (checkpoint, amplitude_min) pair: ONE encoder forward over the test
split, then the cheap correction + pitch metrics re-run across a grid of
(rel_threshold, down_threshold). Shows the thresholds are not tuned to the
default dataset's amplitude_min=0.4 floor and fences the families where the
correction must stay off.

Usage: python scripts/octcorr_sensitivity.py [--out results/round2/octcorr_sensitivity.json]
CPU-friendly: forward is batched; the grid re-runs touch only spectra+pitch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CKPTS = {
    # family tag -> (checkpoint dir, uncorrected-regime note)
    "SOT-2048-anneal1500-42": "runs/tricks/anneal1500-42/checkpoints/best-lsd",
    "SOT-512-anneal-42": "runs/tricks/sot512-anneal-42/checkpoints/best-lsd",
    "SOT-NoCut-anneal-42": "runs/tricks/nocut-anneal-42/checkpoints/best-lsd",
    "SOT-2048-SS-anneal-42-ext":
        "runs/tricks/sot2048ss-anneal-42-ext/checkpoints/best-lsd",
}
AMP_MINS = (0.4, 0.25, 0.1)
REL_GRID = (0.05, 0.1, 0.2)
DOWN_GRID = (0.15, 0.25, 0.4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/round2/octcorr_sensitivity.json")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from sot_tpu import data as data_lib
    from sot_tpu import metrics as M
    from sot_tpu.cli import _coerce_saved_config
    from sot_tpu.configs import get_experiment
    from sot_tpu.training import checkpoint as ckpt_lib
    from sot_tpu.training.trainer import build_modules, forward, init_state

    results = []
    for tag, ckpt in CKPTS.items():
        if not os.path.isdir(ckpt):
            print(f"skip {tag}: missing {ckpt}", file=sys.stderr)
            continue
        run_dir = os.path.dirname(os.path.dirname(os.path.abspath(ckpt)))
        saved = json.load(open(os.path.join(run_dir, "train_config.json")))
        name = saved.pop("name")
        saved.pop("losses", None)
        cfg = get_experiment(name, **_coerce_saved_config(name, saved))
        mod = build_modules(cfg)
        state = init_state(mod, jax.random.key(0))
        state, _ = ckpt_lib.restore(ckpt, state)
        fwd = jax.jit(lambda p, x: forward(mod, p, x, train=False)["pitch_hz"])

        for amp_min in AMP_MINS:
            cfg_d = cfg.replace(amplitude_min=amp_min)
            splits = data_lib.dataset_from_config(cfg_d)
            test = splits["test"]
            x = jnp.asarray(test.x)
            true_hz = np.asarray(test.frequency)[:, 0]

            bs = cfg.batch_size
            preds = []
            for i in range(0, x.shape[0], bs):
                preds.append(np.asarray(fwd(state.params, x[i:i + bs])))
            pred_hz = np.concatenate(preds)  # [clips, frames, 1]

            def metrics_for(p_hz):
                t = jnp.broadcast_to(
                    jnp.asarray(true_hz)[:, None, None], p_hz.shape)
                return {
                    "RPA": round(100 * float(
                        M.raw_pitch_accuracy(jnp.asarray(p_hz), t)), 2),
                    "RCA": round(100 * float(
                        M.raw_chroma_accuracy(jnp.asarray(p_hz), t)), 2),
                    "OD": round(float(
                        M.mean_octave_difference(jnp.asarray(p_hz), t)), 4),
                }

            base = metrics_for(pred_hz)
            row = {"tag": tag, "amplitude_min": amp_min,
                   "uncorrected": base, "grid": {}}
            for rel in REL_GRID:
                for down in DOWN_GRID:
                    corr = M.octave_correct_pitch(
                        x, jnp.asarray(pred_hz),
                        sample_rate=cfg.sample_rate,
                        rel_threshold=rel, down_threshold=down,
                        min_frequency_hz=0.95 * cfg.freq_gen_min)
                    row["grid"][f"rel={rel},down={down}"] = metrics_for(
                        np.asarray(corr))
            results.append(row)
            print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
