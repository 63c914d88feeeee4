"""DP scaling-efficiency harness (BASELINE configs 4-5).

Measures SOT-2048 train-step samples/s at DP=1 and DP=N over a device mesh
and reports efficiency = throughput_N / (N * throughput_1). On a multi-chip
TPU slice this is the real scaling number; on a single chip (or CPU with
XLA_FLAGS=--xla_force_host_platform_device_count=N) it validates that the
sharded step compiles and runs, and measures the virtual-device overhead —
the protocol is identical either way.

    python bench_scaling.py            # uses all visible devices
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py --cpu  # virtual 8-device CPU mesh

(--cpu is needed rather than JAX_PLATFORMS=cpu: this box's sitecustomize
pins the tunnelled TPU platform and overrides the env var, so the platform
must be forced via jax.config after import.)

Prints ONE JSON line with per-configuration samples/s.
"""

from __future__ import annotations

import json
import time


def _measure(step, state, x, rng, iters: int = 20):
    import jax

    state, logs = step(state, x, rng)
    jax.block_until_ready(logs["loss/total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, x, rng)
    jax.block_until_ready(logs["loss/total"])
    return iters * x.shape[0] / (time.perf_counter() - t0)


def main(tiny: bool | None = None, force_cpu: bool = False) -> None:
    import jax

    if force_cpu and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from sot_tpu import data as data_lib
    from sot_tpu.configs import get_experiment
    from sot_tpu.parallel.mesh import make_mesh
    from sot_tpu.parallel.train import make_sharded_train_step
    from sot_tpu.training.trainer import build_modules, init_state, make_train_step

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    if tiny is None:
        tiny = platform == "cpu"  # CPU run = compile/correctness validation
    per_chip_batch = 8 if tiny else 64
    overrides = dict(batch_size=per_chip_batch)
    if tiny:
        overrides.update(n_samples=1024, cqt_fmin=261.6,
                         transform_n_fft=512, transform_hop=128)
    cfg1 = get_experiment("SOT-2048", **overrides)
    mod = build_modules(cfg1)
    rng = jax.random.key(0)

    signals, _, _ = data_lib.generate_sinusoid_dataset(
        seed=0, size=per_chip_batch * max(n_dev, 1), n_samples=cfg1.n_samples,
        render_batch=per_chip_batch)
    all_x = jnp.asarray(data_lib.peak_normalize(signals))

    # DP=1
    state = init_state(mod, rng)
    sps_1 = _measure(make_train_step(mod), state, all_x[:per_chip_batch], rng)

    # Honesty guard (round-4 VERDICT task 9): an "efficiency" measured
    # across VIRTUAL devices sharing host cores is pure resource contention
    # wearing a scaling metric's name. Only real multi-chip hardware gets
    # the efficiency field; virtual meshes emit a correctness-dryrun record
    # that no tool can misread as a hardware scaling result.
    real_multichip = platform not in ("cpu",) and n_dev > 1
    result = {
        "metric": "DP scaling efficiency (SOT-2048 train step)",
        "mode": "hardware-scaling" if real_multichip else "correctness-dryrun",
        "device": platform,
        "n_devices": n_dev,
        "per_chip_batch": per_chip_batch,
        "samples_per_sec_1": round(sps_1, 1),
    }
    if n_dev > 1:
        overrides_n = dict(overrides, batch_size=per_chip_batch * n_dev)
        cfgn = get_experiment("SOT-2048", **overrides_n)
        modn = build_modules(cfgn)
        staten = init_state(modn, rng)
        mesh = make_mesh(n_dev)
        stepn = make_sharded_train_step(modn, mesh)
        sps_n = _measure(stepn, staten, all_x, rng)
        result["sharded_step_ran"] = True
        result["samples_per_sec_n"] = round(sps_n, 1)
        if real_multichip:
            result["efficiency"] = round(sps_n / (n_dev * sps_1), 4)
        else:
            result["note"] = (
                f"{n_dev} virtual devices share this host's cores; the "
                "sharded-vs-single throughput ratio here measures host "
                "contention, NOT scaling. Hardware efficiency requires a "
                "real multi-chip slice (BASELINE >=80% target unmeasured).")
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    main(tiny=("--tiny" in sys.argv) or None, force_cpu="--cpu" in sys.argv)
