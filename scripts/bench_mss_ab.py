"""A/B bench: MSSLoss (6 STFT scales) with the XLA TPU FFT vs the DFT
matmul path (SOT_TPU_DFT_MATMUL=1, ops/stft.py:_rfft_magnitude) at
training shapes (batch 64, 4096 samples).

Honest-timing protocol (.claude/skills/verify/SKILL.md): carry-chained
dispatches over K distinct input slices so the remote tunnel's
identical-arg result cache cannot elide iterations.

Usage: python scripts/bench_mss_ab.py [--iters 8] [--k 8]
Writes results/round2/mss_ab.json and prints it.
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


def make_fns():
    import jax
    import jax.numpy as jnp

    from sot_tpu.losses import MSSLoss

    loss = MSSLoss(mag_weight=1.0, logmag_weight=1.0)

    @jax.jit
    def fwd_scan(xs, ys, c0):
        def body(c, xy):
            x, y = xy
            return c + loss(x, y), None
        out, _ = jax.lax.scan(body, c0, (xs, ys))
        return out

    g = jax.grad(lambda x, y: loss(x, y), argnums=1)

    @jax.jit
    def grad_scan(xs, ys, c0):
        def body(c, xy):
            x, y = xy
            return c + jnp.sum(jnp.abs(g(x, y))), None
        out, _ = jax.lax.scan(body, c0, (xs, ys))
        return out

    return fwd_scan, grad_scan


def time_call(fn, xs, ys, iters: int):
    import jax
    import jax.numpy as jnp

    c = fn(xs, ys, jnp.float32(0.0))  # compile + warm
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(xs, ys, c)  # chained carry: distinct args each dispatch
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / (iters * xs.shape[0]) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    kx, ky = jax.random.split(jax.random.key(1))
    xs = jax.random.normal(kx, (args.k, 64, 4096), jnp.float32)
    ys = jax.random.normal(ky, (args.k, 64, 4096), jnp.float32)
    results = {"device": str(jax.devices()[0]), "batch": 64, "samples": 4096,
               "k": args.k, "iters": args.iters}
    # pallas = fused framing+window+DFT frontend on the hop>=128 scales
    # (2048/1024/512; ops/pallas/stft.py), remaining scales on the XLA fft;
    # pallas+dft additionally puts the small scales on the DFT matmul.
    for variant in ("fft", "dft_matmul", "pallas", "pallas+dft"):
        os.environ.pop("SOT_TPU_DFT_MATMUL", None)
        os.environ.pop("SOT_TPU_STFT_PALLAS", None)
        if "dft" in variant and variant != "pallas":
            os.environ["SOT_TPU_DFT_MATMUL"] = "1"
        if variant.startswith("pallas"):
            os.environ["SOT_TPU_STFT_PALLAS"] = "1"
        try:
            fwd, grad = make_fns()
            fwd_ms = time_call(fwd, xs, ys, args.iters)
            grad_ms = time_call(grad, xs, ys, args.iters)
        except Exception as e:  # noqa: BLE001 — one-shot unattended run
            results[variant] = {"error": f"{type(e).__name__}: {e}"[:500]}
            print(f"{variant:11s} FAILED: {e}", flush=True)
            continue
        results[variant] = {"fwd_ms": round(fwd_ms, 3),
                            "grad_ms": round(grad_ms, 3)}
        print(f"{variant:11s} fwd {fwd_ms:7.3f} ms  grad {grad_ms:7.3f} ms",
              flush=True)
        os.makedirs("results/round2", exist_ok=True)
        with open("results/round2/mss_ab.json", "w") as f:
            json.dump(results, f, indent=1)
    os.environ.pop("SOT_TPU_DFT_MATMUL", None)
    os.environ.pop("SOT_TPU_STFT_PALLAS", None)
    results["complete"] = True
    os.makedirs("results/round2", exist_ok=True)
    with open("results/round2/mss_ab.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
