"""Command-line entry points (L6).

Replaces the reference's LightningCLI/jsonargparse stack (train.py:19-236)
with an explicit registry-driven CLI:

    python -m sot_tpu.cli train --experiment SOT-2048 --seed 42 --steps 25000 \
        --out runs/sot2048-42
    python -m sot_tpu.cli evaluate --experiment SOT-2048 --ckpt runs/.../best-lsd
    python -m sot_tpu.cli generate-data --out data/sinusoids.npz
    python -m sot_tpu.cli list

A resolved-config snapshot is persisted into the run directory
(cf. reference save_config.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

from sot_tpu.configs import EXPERIMENTS, PAPER_SEEDS, get_experiment


def _save_resolved_config(cfg, out_dir: str) -> None:
    """Persist the resolved config into the run dir, process-0 only on
    multi-host launches (reference save_config.py:24-35 rank-0 guard)."""
    try:
        import jax

        if jax.process_index() != 0:
            return
    except Exception:
        pass
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "train_config.json"), "w") as fh:
        json.dump(dataclasses.asdict(cfg), fh, indent=2, default=str)


def _load_config_files(paths) -> dict:
    """YAML/JSON config overrides, with master-config expansion: a file whose
    top level has a ``configs:`` list pulls in those files in order, later
    entries overriding earlier ones (reference train.py:209-236)."""
    import yaml

    merged: dict = {}
    for path in paths:
        with open(path) as fh:
            doc = yaml.safe_load(fh) or {}
        if isinstance(doc, dict) and "configs" in doc:
            sub = [os.path.join(os.path.dirname(path), c)
                   if not os.path.isabs(c) else c for c in doc.pop("configs")]
            merged.update(_load_config_files(sub))
        if not isinstance(doc, dict):
            raise ValueError(f"config {path} must be a mapping")
        merged.update(doc)
    return merged


def _parse_set_overrides(pairs) -> dict:
    """--set key=value generic field overrides (typed via json parsing)."""
    out = {}
    for pair in pairs or ():
        key, _, value = pair.partition("=")
        try:
            out[key] = json.loads(value)
        except json.JSONDecodeError:
            out[key] = value
    return out


def _profile_steps(cfg, trace_dir: str, n_steps: int = 5) -> None:
    """Capture a device trace of warmed-up train steps + print the op table."""
    import jax
    import jax.numpy as jnp

    from sot_tpu import data as data_lib
    from sot_tpu.training.profiling import print_trace_summary, trace
    from sot_tpu.training.trainer import build_modules, init_state, make_train_step

    mod = build_modules(cfg)
    rng = jax.random.key(cfg.seed)
    state = init_state(mod, rng)
    step = make_train_step(mod)
    signals, _, _ = data_lib.generate_sinusoid_dataset(
        seed=0, size=cfg.batch_size, n_samples=cfg.n_samples,
        render_batch=cfg.batch_size)
    x = jnp.asarray(data_lib.peak_normalize(signals))
    for _ in range(3):
        state, logs = step(state, x, rng)
    jax.block_until_ready(logs["loss/total"])
    with trace(trace_dir):
        for _ in range(n_steps):
            state, logs = step(state, x, rng)
        jax.block_until_ready(logs["loss/total"])
    print(f"# device trace -> {trace_dir} (top ops, ms/step):")
    try:
        print_trace_summary(trace_dir, steps=n_steps, top=15)
    except Exception as exc:  # pragma: no cover
        print(f"# (trace summary unavailable: {exc})")


def cmd_train(args: argparse.Namespace) -> int:
    from sot_tpu import data as data_lib
    from sot_tpu.training.trainer import train

    overrides = {}
    if args.config:
        file_overrides = _load_config_files(args.config)
        experiment = file_overrides.pop("experiment", args.experiment)
        overrides.update(file_overrides)
    else:
        experiment = args.experiment
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.dataset is not None:
        overrides["dataset_path"] = args.dataset
    if args.dataset_size is not None:
        overrides["dataset_size"] = args.dataset_size
    if args.eval_every is not None:
        overrides["eval_every_steps"] = args.eval_every
    overrides.update(_parse_set_overrides(args.set))
    cfg = get_experiment(experiment, **overrides)

    if args.kernels == "auto":
        # adopt the committed on-chip A/B winners (semantics-preserving
        # speed variants; read from env at trace time by the dispatchers)
        from sot_tpu.kernel_gates import apply_auto_gates

        applied = apply_auto_gates()
        print(f"kernel gates (auto): {applied}")

    out = args.out or f"runs/{cfg.name}-{cfg.seed}"
    os.makedirs(out, exist_ok=True)
    _save_resolved_config(cfg, out)

    if args.profile:
        _profile_steps(cfg, os.path.join(out, "trace"))

    splits = data_lib.dataset_from_config(cfg)
    state, best = train(
        cfg,
        max_steps=args.steps,
        checkpoint_dir=os.path.join(out, "checkpoints"),
        log_file=os.path.join(out, "log.jsonl"),
        splits=splits,
        resume_from=args.resume,
        figure_dir=out if args.figures else None,
    )
    with open(os.path.join(out, "best_metrics.json"), "w") as fh:
        json.dump(best, fh, indent=2)
    print(json.dumps({"best_val_metrics": best}))

    if args.final_eval and "test" in splits:
        # in-process test eval of the best-LSD params (the returned state
        # carries them): plain, octave-corrected, and comb-corrected —
        # saves a full CLI/compile round-trip per sweep run
        from sot_tpu.training.trainer import (build_modules, evaluate,
                                              make_eval_step)

        for variant, fname in (("plain", "test_metrics.json"),
                               ("octcorr", "test_metrics_octcorr.json"),
                               ("comb", "test_metrics_comb.json")):
            cfg_e = cfg.replace(
                eval_octave_correction=variant == "octcorr",
                eval_comb_correction=variant == "comb")
            mod = build_modules(cfg_e)
            m = evaluate(mod, make_eval_step(mod), state.params,
                         splits["test"], cfg.batch_size)
            with open(os.path.join(out, fname), "w") as fh:
                json.dump({"test_metrics": m}, fh, indent=2)
            key = "test_metrics" + ("" if variant == "plain" else f"_{variant}")
            print(json.dumps({key: m}))
    return 0


def _coerce_saved_config(experiment: str, saved: dict) -> dict:
    """Coerce train_config.json values back to ExperimentConfig field types.

    _save_resolved_config serialises with ``default=str``, so JSON round-trips
    lose tuple-ness (lists) and would silently stringify any future
    non-JSON-native field. Compare each value against the preset's field and
    (a) restore tuples, (b) fail loudly on a str where the preset holds a
    non-str non-None value (the field did not round-trip)."""
    from sot_tpu.configs import get_experiment

    preset = get_experiment(experiment)
    out = {}
    for key, val in saved.items():
        if not hasattr(preset, key):
            raise ValueError(
                f"train_config.json field {key!r} is not an ExperimentConfig "
                f"field (config schema drift?)")
        ref = getattr(preset, key)
        if isinstance(ref, tuple) and isinstance(val, list):
            val = tuple(val)
        elif isinstance(val, list) and ref is None:
            # Optional tuple fields (e.g. temperature_schedule) default None
            val = tuple(val)
        elif (isinstance(val, str) and ref is not None
              and not isinstance(ref, str)):
            raise ValueError(
                f"train_config.json field {key!r} stringified to {val!r} "
                f"(preset holds {type(ref).__name__}); the config did not "
                f"round-trip — fix _save_resolved_config for this field")
        out[key] = val
    return out


def _restore_any(ckpt: str, state):
    """Restore params from either an Orbax run checkpoint (directory, the
    native format) or a reference torch/Lightning checkpoint FILE
    (.ckpt/.pt/.pth — reference eval_paper.py:22-51 releases these); the
    latter imports encoder weights via models.import_torch, enabling
    paper-table reproduction from the published artifacts."""
    import os as _os

    if _os.path.isfile(ckpt):
        from sot_tpu.models.import_torch import load_from_reference_ckpt

        params = load_from_reference_ckpt(state.params, ckpt)
        return state._replace(params=params), 0
    from sot_tpu.training import checkpoint as ckpt_lib

    return ckpt_lib.restore(ckpt, state)


def _config_for_ckpt(args) -> "object":
    """Resolve the experiment config for an evaluation/analysis command.

    If the checkpoint lives inside a run directory with a saved
    train_config.json, that resolved config is used (the config travels
    with the checkpoint); explicit --set/--dataset flags override it.
    """
    overrides = {}
    experiment = args.experiment
    if args.ckpt:
        run_dir = os.path.dirname(os.path.dirname(os.path.abspath(args.ckpt)))
        cfg_path = os.path.join(run_dir, "train_config.json")
        if os.path.exists(cfg_path):
            saved = json.load(open(cfg_path))
            experiment = saved.pop("name", experiment)
            saved.pop("losses", None)  # preset-defined; not a flat override
            overrides.update(_coerce_saved_config(experiment, saved))
    if args.dataset:
        overrides["dataset_path"] = args.dataset
    if getattr(args, "dataset_size", None):
        overrides["dataset_size"] = args.dataset_size
    overrides.update(_parse_set_overrides(getattr(args, "set", None)))
    return get_experiment(experiment, **overrides)


def cmd_evaluate(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp

    from sot_tpu import data as data_lib
    from sot_tpu.training import checkpoint as ckpt_lib
    from sot_tpu.training.trainer import (build_modules, evaluate, init_state,
                                          make_eval_step)

    cfg = _config_for_ckpt(args)
    mod = build_modules(cfg)
    state = init_state(mod, jax.random.key(0))
    if args.ckpt:
        state, _ = _restore_any(args.ckpt, state)
    splits = data_lib.dataset_from_config(cfg)
    eval_step = make_eval_step(mod)
    if args.split not in splits:
        raise SystemExit(f"split '{args.split}' not present in dataset "
                         f"(available: {sorted(splits)})")
    metrics = evaluate(mod, eval_step, state.params, splits[args.split],
                       cfg.batch_size)
    print(json.dumps({f"{args.split}_metrics": metrics}, indent=2))
    return 0


def _load_audio(path: str):
    import numpy as np

    if path.endswith(".npz"):
        with np.load(path) as z:
            key = "signals" if "signals" in z.files else z.files[0]
            x = z[key]
    else:
        x = np.load(path)
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[None]
    if x.ndim != 2:
        raise SystemExit(f"expected [T] or [batch, T] audio, got {x.shape}")
    return x


def cmd_predict(args: argparse.Namespace) -> int:
    """Batch inference: pitch + harmonic amplitudes for audio clips.

    The serving-side entry the reference lacks: loads a checkpoint (with
    its travelling config), applies the config-gated unsupervised
    correction (`inference_comb_correction` / `inference_octave_correction`,
    enable via --set), and writes per-frame pitch_hz / pitch_unit /
    harmonic weights as .npz or prints pitch_hz as JSON."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sot_tpu import data as data_lib
    from sot_tpu.training import checkpoint as ckpt_lib
    from sot_tpu.training.trainer import build_modules, init_state, predict

    cfg = _config_for_ckpt(args)
    mod = build_modules(cfg)
    state = init_state(mod, jax.random.key(0))
    if args.ckpt:
        state, _ = _restore_any(args.ckpt, state)

    x = _load_audio(args.input)
    if not args.no_normalize:
        # the model is trained on peak-normalized clips (data.py x0.9)
        x = data_lib.peak_normalize(x)
    x = jnp.asarray(x, jnp.float32)

    fn = jax.jit(partial(predict, mod))
    bs = cfg.batch_size
    n = x.shape[0]
    pad = (-n) % bs
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    keep = ("pitch_hz", "pitch_unit", "weights")
    chunks = []
    for i in range(0, x.shape[0], bs):
        out = fn(state.params, x[i:i + bs])
        chunks.append({k: np.asarray(v) for k, v in out.items() if k in keep})
    res = {k: np.concatenate([c[k] for c in chunks])[:n].squeeze(-1)
           if k != "weights" else np.concatenate([c[k] for c in chunks])[:n]
           for k in chunks[0]}
    if args.output:
        os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                    exist_ok=True)
        np.savez(args.output, **res)
        print(f"wrote {args.output}: " + ", ".join(
            f"{k} {tuple(v.shape)}" for k, v in sorted(res.items())))
    else:
        print(json.dumps({"pitch_hz": res["pitch_hz"].tolist()}))
    return 0


def cmd_generate_data(args: argparse.Namespace) -> int:
    import numpy as np

    from sot_tpu import data as data_lib

    signals, freqs, amps = data_lib.generate_sinusoid_dataset(
        seed=args.seed, size=args.size)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, signals=signals, frequency=freqs, weights=amps)
    print(f"wrote {args.out}: {signals.shape[0]} items x {signals.shape[1]} samples")
    return 0


def cmd_analyze(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sot_tpu import data as data_lib
    from sot_tpu.analysis import pitch_error_report
    from sot_tpu.training import checkpoint as ckpt_lib
    from sot_tpu.training.trainer import build_modules, forward, init_state

    cfg = _config_for_ckpt(args)
    mod = build_modules(cfg)
    state = init_state(mod, jax.random.key(0))
    state, _ = _restore_any(args.ckpt, state)
    splits = data_lib.dataset_from_config(cfg)
    split = splits[args.split]

    def predict_pitch(p, x):
        from sot_tpu.training.trainer import (apply_comb_correction,
                                              apply_octave_correction)

        pitch_hz = forward(mod, p, x)["pitch_hz"]
        if args.correction == "octave":
            pitch_hz, _ = apply_octave_correction(mod, x, pitch_hz)
        elif args.correction == "comb":
            pitch_hz, _ = apply_comb_correction(mod, x, pitch_hz)
        return pitch_hz

    fwd = jax.jit(predict_pitch)
    chunks = []
    for batch in data_lib.iterate_batches(split, cfg.batch_size, drop_last=False):
        chunks.append(np.asarray(fwd(state.params, jnp.asarray(batch["x"]))))
    pitch = np.concatenate(chunks)[:, :, 0]
    n = pitch.shape[0]
    report = pitch_error_report(pitch, split.frequency[:n, 0])
    print(json.dumps(report, indent=2))
    return 0


def cmd_list(_args: argparse.Namespace) -> int:
    for name, cfg in EXPERIMENTS.items():
        loss_desc = " + ".join(
            f"{l.weight}x{l.kind}" for l in cfg.losses)
        print(f"{name:14s} transform={cfg.transform}:{cfg.transform_n_fft} "
              f"losses=[{loss_desc}] rolloff={cfg.apply_roll_off}")
    print(f"paper seeds: {PAPER_SEEDS}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sot_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train an experiment")
    t.add_argument("--experiment", default="SOT-2048", choices=sorted(EXPERIMENTS))
    t.add_argument("--seed", type=int, default=None)
    t.add_argument("--steps", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--dataset", default=None, help="path to reference .pth dataset")
    t.add_argument("--dataset-size", type=int, default=None)
    t.add_argument("--eval-every", type=int, default=None)
    t.add_argument("--out", default=None)
    t.add_argument("--resume", default=None, help="checkpoint path to resume from")
    t.add_argument("--config", action="append", default=None,
                   help="YAML/JSON config override file (repeatable; a "
                        "'configs:' list inside expands to more files)")
    t.add_argument("--set", action="append", default=None, metavar="KEY=VAL",
                   help="generic config field override (repeatable)")
    t.add_argument("--kernels", default="default",
                   choices=("default", "auto"),
                   help="'auto' adopts the committed A/B kernel-gate "
                        "winners (results/round2/*_ab.json) for this run; "
                        "default keeps the baseline kernels")
    t.add_argument("--figures", action="store_true",
                   help="write spectrum/probability figures each eval epoch")
    t.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of a few steps "
                        "into <out>/trace and print the per-op summary")
    t.add_argument("--final-eval", action="store_true",
                   help="after training, evaluate the best-LSD params on the "
                        "test split in-process (plain + octave-corrected) and "
                        "write test_metrics[_octcorr].json into the run dir")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluate", help="evaluate a checkpoint")
    e.add_argument("--experiment", default="SOT-2048", choices=sorted(EXPERIMENTS))
    e.add_argument("--ckpt", default=None)
    e.add_argument("--dataset", default=None)
    e.add_argument("--dataset-size", type=int, default=None)
    e.add_argument("--split", default="test", choices=("train", "val", "test"))
    e.add_argument("--set", action="append", default=None, metavar="KEY=VAL")
    e.set_defaults(fn=cmd_evaluate)

    pr = sub.add_parser("predict", help="batch inference on audio clips")
    pr.add_argument("--experiment", default="SOT-2048", choices=sorted(EXPERIMENTS))
    pr.add_argument("--ckpt", required=True)
    pr.add_argument("--input", required=True,
                   help=".npy [T] or [batch, T] float audio @ the model's "
                        "sample rate, or .npz with a 'signals' array")
    pr.add_argument("--output", default=None,
                   help="write pitch_hz/pitch_unit/weights as .npz "
                        "(default: print pitch_hz JSON to stdout)")
    pr.add_argument("--no-normalize", action="store_true",
                   help="skip the training-matching peak normalization")
    pr.add_argument("--dataset", default=None, help=argparse.SUPPRESS)
    pr.add_argument("--set", action="append", default=None, metavar="KEY=VAL",
                   help="config overrides, e.g. inference_comb_correction=true")
    pr.set_defaults(fn=cmd_predict)

    g = sub.add_parser("generate-data", help="generate the synthetic dataset")
    g.add_argument("--out", default="data/sinusoids.npz")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--size", type=int, default=4000)
    g.set_defaults(fn=cmd_generate_data)

    a = sub.add_parser("analyze", help="pitch-error breakdown of a checkpoint")
    a.add_argument("--experiment", default="SOT-2048", choices=sorted(EXPERIMENTS))
    a.add_argument("--ckpt", required=True)
    a.add_argument("--dataset", default=None)
    a.add_argument("--dataset-size", type=int, default=None)
    a.add_argument("--split", default="val", choices=("train", "val", "test"))
    a.add_argument("--set", action="append", default=None, metavar="KEY=VAL")
    a.add_argument("--correction", default="none",
                   choices=("none", "octave", "comb"),
                   help="apply a test-time correction before the breakdown "
                        "(classifies the post-correction residual)")
    a.set_defaults(fn=cmd_analyze)

    l = sub.add_parser("list", help="list experiment presets")
    l.set_defaults(fn=cmd_list)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
