"""Committed per-op profile of the SOT-2048 train step (VERDICT round-1
task 6: the profile that justifies what gets built next).

Runs the bench.py train-step loop under jax.profiler, prints the per-op
device-time table (ms/step) plus the step total. Adopts the committed A/B
kernel-gate winners exactly like bench.py (explicit env settings win), so
the committed profile reflects the shipped configuration; pass
--no-auto-gates for the gate-free baseline step.

Usage: python scripts/profile_step.py [--steps 20] [--no-auto-gates]
"""

from __future__ import annotations

import argparse

import os
import tempfile
import time


def _apply_auto_gates() -> dict:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sot_tpu.kernel_gates import apply_auto_gates

    return apply_auto_gates()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-auto-gates", action="store_true")
    ap.add_argument("--single-step", action="store_true",
                    help="profile the single train_step program (bench.py's "
                    "program) instead of the epoch scan — per-step Python "
                    "dispatch inflates WALL numbers, but per-op DEVICE "
                    "times stay valid and the compile is minutes cheaper "
                    "for gated kernel variants")
    args = ap.parse_args()

    gates = {} if args.no_auto_gates else _apply_auto_gates()
    print(f"# kernel gates: {gates}")

    import jax
    import jax.numpy as jnp

    from sot_tpu import data as data_lib
    from sot_tpu.configs import get_experiment
    from sot_tpu.training.profiling import print_trace_summary, trace
    from sot_tpu.training.trainer import (build_modules, init_state,
                                          make_train_step,
                                          make_train_steps_scan)

    cfg = get_experiment("SOT-2048")
    mod = build_modules(cfg)
    rng = jax.random.key(0)
    state = init_state(mod, rng)
    # Scan-dispatch the whole profiled window as ONE XLA program (the real
    # loop's dispatch mode, trainer.make_train_steps_scan): per-step Python
    # dispatch over the remote tunnel used to inflate the profiled wall ~5x
    # vs bench.py (round-2 postmortem — 68.6 ms/step wall over ~10.5 ms of
    # device time).
    if args.single_step:
        step_fn = make_train_step(mod)

        def train_steps(state, x_all, los, rng):
            logs = None
            for _ in range(len(los)):
                state, logs = step_fn(state, x_all, rng)
            return state, logs
    else:
        train_steps = make_train_steps_scan(mod)

    signals, _, _ = data_lib.generate_sinusoid_dataset(
        seed=0, size=cfg.batch_size, n_samples=cfg.n_samples,
        render_batch=cfg.batch_size)
    x_all = jnp.asarray(data_lib.peak_normalize(signals))
    los = jnp.zeros((args.steps,), jnp.int32)

    state, logs = train_steps(state, x_all, los, rng)  # compile + warm
    jax.block_until_ready(logs["loss/total"])

    # Untraced wall first: the jax.profiler trace ships its event stream
    # over the remote tunnel, inflating the traced wall ~5x (round-2
    # postmortem) — the untraced scan dispatch is the honest step time and
    # must agree with bench.py within noise.  Each dispatch consumes the
    # previous dispatch's state, so the tunnel's identical-arg result cache
    # can never elide it.
    t0 = time.perf_counter()
    state, logs = train_steps(state, x_all, los, rng)
    jax.block_until_ready(logs["loss/total"])
    wall = (time.perf_counter() - t0) / args.steps * 1e3

    log_dir = tempfile.mkdtemp(prefix="sot_profile_")
    t0 = time.perf_counter()
    with trace(log_dir):
        state, logs = train_steps(state, x_all, los, rng)
        jax.block_until_ready(logs["loss/total"])
    wall_traced = (time.perf_counter() - t0) / args.steps * 1e3

    print(f"# device: {jax.devices()[0]}")
    print(f"# merge kernel: {bool(os.environ.get('SOT_TPU_W2_MERGE'))}")
    print(f"# wall ms/step: {wall:.3f}  ({args.steps} steps, one scan "
          "dispatch, untraced)")
    print(f"# traced wall ms/step: {wall_traced:.3f}  (includes profiler "
          "event shipping over the remote tunnel; NOT a step-time number)")
    print_trace_summary(log_dir, steps=args.steps, top=30)


if __name__ == "__main__":
    main()
