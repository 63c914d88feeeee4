"""Benchmark: SOT-2048 train-step throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "audio frames/sec/chip (SOT-2048 train step)",
   "value": N, "unit": "frames/s/chip", "vs_baseline": null, ...}

'audio frames' = CQT/STFT analysis frames processed per second
(batch 64 x 16 frames per 4096-sample clip — the paper training config).
The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported against a reference-stack measurement when available (torch CPU
is not comparable; null otherwise).

Kernel gates: env-gated alternative kernels (Pallas merge SOT, Pallas
im2col conv, DFT-matmul rfft) are auto-enabled when their committed A/B
(results/round2/*_ab.json, produced on this chip by the sweep prelude)
shows a >3% win; explicit env settings take precedence, and a failed run
with auto-gates falls back to the gate-free baseline.
"""

from __future__ import annotations

import json
import os
import time

_AB_GATES = (
    # (ab json, baseline key, candidate key, env gates for the candidate)
    ("results/round2/sot_ab.json", "plane", "merge", ("SOT_TPU_W2_MERGE",)),
    ("results/round2/conv_ab.json", "xla", "pallas",
     ("SOT_TPU_CONV_PALLAS",)),
    # MSS rfft path: candidates are mutually exclusive recipes; the best
    # total wins (pallas = fused frontend on the hop>=128 scales)
    ("results/round2/mss_ab.json", "fft", "dft_matmul",
     ("SOT_TPU_DFT_MATMUL",)),
    ("results/round2/mss_ab.json", "fft", "pallas",
     ("SOT_TPU_STFT_PALLAS",)),
    ("results/round2/mss_ab.json", "fft", "pallas+dft",
     ("SOT_TPU_STFT_PALLAS", "SOT_TPU_DFT_MATMUL")),
)


def _auto_gates() -> dict:
    gates = {}
    best_mss = (None, 1e9)  # (env tuple, total) across the mss candidates

    def total(d):
        return d.get("fwd_ms", 1e9) + d.get("grad_ms", 1e9)

    for path, base_key, cand_key, envs in _AB_GATES:
        if any(env in os.environ for env in envs):
            continue  # explicit setting wins
        try:
            ab = json.load(open(path))
        except Exception:  # noqa: BLE001 — A/B not run yet
            continue
        cand, base = ab.get(cand_key, {}), ab.get(base_key, {})
        if total(cand) < 0.97 * total(base):
            if path.endswith("mss_ab.json"):
                if total(cand) < best_mss[1]:
                    best_mss = (envs, total(cand))
                continue
            for env in envs:
                gates[env] = "1"
            if "SOT_TPU_W2_MERGE" in envs and cand.get("rows"):
                gates["SOT_TPU_MERGE_ROWS"] = str(cand["rows"])
    if best_mss[0]:
        for env in best_mss[0]:
            gates[env] = "1"
    return gates


def _run_bench():
    import jax
    import jax.numpy as jnp

    from sot_tpu import data as data_lib
    from sot_tpu.configs import get_experiment
    from sot_tpu.training.trainer import build_modules, init_state, make_train_step

    cfg = get_experiment("SOT-2048")
    mod = build_modules(cfg)
    rng = jax.random.key(0)
    state = init_state(mod, rng)
    train_step = make_train_step(mod)

    signals, _, _ = data_lib.generate_sinusoid_dataset(
        seed=0, size=cfg.batch_size, n_samples=cfg.n_samples,
        render_batch=cfg.batch_size)
    x = jnp.asarray(data_lib.peak_normalize(signals))

    # warmup / compile
    for _ in range(3):
        state, logs = train_step(state, x, rng)
    jax.block_until_ready(logs["loss/total"])

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, logs = train_step(state, x, rng)
    jax.block_until_ready(logs["loss/total"])
    elapsed = time.perf_counter() - t0

    steps_per_sec = n_iters / elapsed
    frames_per_clip = cfg.n_samples // cfg.cqt_hop_length  # 16
    frames_per_sec = steps_per_sec * cfg.batch_size * frames_per_clip

    return {
        "metric": "audio frames/sec/chip (SOT-2048 train step)",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s/chip",
        "vs_baseline": None,
        "steps_per_sec": round(steps_per_sec, 3),
        "samples_per_sec": round(steps_per_sec * cfg.batch_size, 1),
        "batch_size": cfg.batch_size,
        "device": str(jax.devices()[0]),
        "final_loss": float(logs["loss/total"]),
    }


def main() -> None:
    gates = _auto_gates()
    os.environ.update(gates)
    try:
        result = _run_bench()
    except Exception:  # noqa: BLE001 — fall back to the gate-free baseline
        if not gates:
            raise
        for k in gates:
            os.environ.pop(k, None)
        result = _run_bench()
        gates = {"failed": list(gates)}
    result["kernel_gates"] = gates
    print(json.dumps(result))


if __name__ == "__main__":
    main()
