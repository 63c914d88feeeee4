"""A/B bench: XLA gather+matmul CQT vs the fused Pallas frame-slab kernel.

Shapes mirror the train step's feature extraction: batch 64 x 4095 samples
(the x[:, :-1] reference-parity drop), 285 bins, hop 256 -> the padded
signal is [64, 36863] and the XLA path's frame gather materializes
bf16[1024, 32768] per batch — the step's #1 single op in the round-4
profile. Forward only: the CQT is computed on input data, no grad flows.

Measurement notes (.claude/skills/verify/SKILL.md): carry-chained scans
over K distinct batches per dispatch defeat the tunnel's identical-arg
result cache.

Usage: python scripts/bench_cqt_ab.py [--iters 8] [--k 8]
Writes results/round2/cqt_ab.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

print(f"# exe={sys.executable} cwd={os.getcwd()} file={__file__}",
      file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sot_tpu import data as data_lib
    from sot_tpu.ops.cqt import cqt_magnitude

    def batch(seed):
        t0 = time.perf_counter()
        signals, _, _ = data_lib.generate_sinusoid_dataset(
            seed=seed, size=64, n_samples=4096, render_batch=64)
        out = jnp.asarray(data_lib.peak_normalize(signals))[:, :-1]
        print(f"# datagen seed {seed}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        return out

    xs = jnp.stack([batch(200 + i) for i in range(args.k)])
    results = {"device": str(jax.devices()[0]), "batch": 64,
               "n_samples": int(xs.shape[-1]), "k": args.k,
               "iters": args.iters}

    def make_fn():
        @jax.jit
        def fwd_scan(xs, c0):
            def body(c, x):
                m = cqt_magnitude(x, n_bins=285, hop_length=256)
                return c + jnp.sum(m), None
            out, _ = jax.lax.scan(body, c0, xs)
            return out

        return fwd_scan

    vals = {}
    for variant in ("xla", "pallas"):
        os.environ.pop("SOT_TPU_CQT_PALLAS", None)
        if variant == "pallas":
            os.environ["SOT_TPU_CQT_PALLAS"] = "1"
        try:
            fn = make_fn()
            c = fn(xs, jnp.float32(0.0))
            jax.block_until_ready(c)
            vals[variant] = float(c) / args.k
            t0 = time.perf_counter()
            for _ in range(args.iters):
                c = fn(xs, c)
            jax.block_until_ready(c)
            ms = (time.perf_counter() - t0) / (args.iters * args.k) * 1e3
            results[variant] = {"fwd_ms": round(ms, 3), "grad_ms": 0.0}
            print(f"{variant:7s} fwd {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — record, continue
            results[variant] = {"error": f"{type(e).__name__}: {e}"[:500]}
            print(f"{variant:7s} FAILED: {e}", flush=True)
        finally:
            os.environ.pop("SOT_TPU_CQT_PALLAS", None)
        os.makedirs("results/round2", exist_ok=True)
        with open("results/round2/cqt_ab.json", "w") as f:
            json.dump(results, f, indent=1)

    # on-chip value parity between the two paths (bf16 MXU both sides):
    # sums of |CQT| over identical inputs must agree to bf16 noise
    if "xla" in vals and "pallas" in vals:
        rel = abs(vals["pallas"] - vals["xla"]) / (abs(vals["xla"]) + 1e-12)
        results["parity"] = {"rel_sum_diff": rel, "ok": rel < 1e-3}
        print(f"parity  rel sum diff {rel:.3e} "
              f"({'OK' if rel < 1e-3 else 'FAIL'})", flush=True)

    results["complete"] = True
    with open("results/round2/cqt_ab.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
