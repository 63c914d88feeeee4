"""A/B bench: same-grid W2 paths at paper shapes on the current device.

Variants (dispatch in sot_tpu/ops/pallas/sot.py:wasserstein_same_grid):
  plane     — banded-plane Pallas kernel (round-1 default)
  merge     — Pallas bitonic-merge O(n log n) kernel (SOT_TPU_W2_MERGE=1)
(the lax.sort 'sortmerge' prototype lost its round-3 A/B 10x and was
demoted to a test oracle in round 4 — no longer dispatchable or benched;
its committed numbers live in sot_ab.json and PERF.md)

Shapes mirror the SOT-2048 training loss: rows = batch 64 x 16 frames =
1024, bins = 1025 (n_fft 2048). u = spectra of a DIFFERENT random dataset
(mimics untrained x_hat: loose CDF bands, the plane kernel's worst case),
v = training-target spectra.

Measurement notes (.claude/skills/verify/SKILL.md): the remote tunnel elides
re-execution of identical-arg calls, so each timed call scans over K
distinct input slices inside ONE dispatch and we report ms per slice.

Usage: python scripts/bench_sot_ab.py [--iters 8] [--k 16]
Writes results/round2/sot_ab.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Startup diagnostics (round-2 postmortem: an unattended run failed with
# ModuleNotFoundError that was unreproducible later; log enough to diagnose
# the next one).
print(f"# exe={sys.executable} cwd={os.getcwd()} file={__file__}",
      file=sys.stderr, flush=True)


def build_data(k: int, n_fft: int = 2048):
    import jax.numpy as jnp
    import numpy as np

    from sot_tpu import data as data_lib
    from sot_tpu.ops.stft import stft_magnitude

    def spectra(seed):
        signals, _, _ = data_lib.generate_sinusoid_dataset(
            seed=seed, size=64, n_samples=4096, render_batch=64)
        x = jnp.asarray(data_lib.peak_normalize(signals))
        s = stft_magnitude(x, size=n_fft, overlap=1 - 256 / n_fft,
                           window="flattop")
        return s.reshape(-1, s.shape[-1])  # [B*frames, n_fft//2+1]

    v = spectra(0)
    us = jnp.stack([spectra(100 + i) for i in range(k)])
    grid = jnp.linspace(0.0, 1.0, v.shape[-1])
    return grid, us, v


def make_fns(grid, v):
    import jax
    import jax.numpy as jnp

    from sot_tpu.ops.pallas.sot import wasserstein_same_grid

    # training convention (losses.py Wasserstein1D.__call__): first arg is
    # the CONSTANT target spectrum, second the prediction carrying gradients
    def loss_rows(u):
        return wasserstein_same_grid(grid, v, u, p=2.0,
                                     limit_quantile_range=True,
                                     target_constant=True)

    # Both fns thread a carry scalar: each timed dispatch gets a DIFFERENT
    # argument (the accumulated loss), so the tunnel's identical-arg result
    # cache (verify SKILL.md) can never elide an iteration.
    @jax.jit
    def fwd_scan(us, c0):
        def body(c, u):
            return c + jnp.sum(loss_rows(u)), None
        out, _ = jax.lax.scan(body, c0, us)
        return out

    @jax.jit
    def grad_scan(us, c0):
        g = jax.grad(lambda u: jnp.sum(loss_rows(u)))

        def body(c, u):
            return c + jnp.sum(jnp.abs(g(u))), None
        out, _ = jax.lax.scan(body, c0, us)
        return out

    return fwd_scan, grad_scan


def time_call(fn, us, iters: int):
    import jax
    import jax.numpy as jnp

    c = fn(us, jnp.float32(0.0))  # compile + warm
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(us, c)  # chained carry: distinct args, serial dependency
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / (iters * us.shape[0]) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--variants", default="plane,merge,hybrid")
    ap.add_argument("--n-fft", type=int, default=2048,
                    help="loss-STFT size (512 for the SOT-512 families); "
                         "non-default writes sot_ab_<n_fft>.json")
    args = ap.parse_args()
    out_name = ("sot_ab.json" if args.n_fft == 2048
                else f"sot_ab_{args.n_fft}.json")

    import jax

    grid, us, v = build_data(args.k, args.n_fft)
    results = {"device": str(jax.devices()[0]),
               "rows": int(v.shape[0]), "bins": int(v.shape[1]),
               "k": args.k, "iters": args.iters}
    for variant in args.variants.split(","):
        os.environ.pop("SOT_TPU_W2_MERGE", None)
        if variant == "merge":
            os.environ["SOT_TPU_W2_MERGE"] = "1"
        elif variant == "hybrid":
            # merge forward + plane backward (the training-safe mode —
            # see results/round2/merge_train_verdict.json)
            os.environ["SOT_TPU_W2_MERGE"] = "hybrid"
        # merge kernel rows ride the lane axis: blocks must be 128-divisible
        # (real-TPU finding — 64/32 are rejected at Mosaic lowering), so
        # there is no smaller-block fallback; a compile failure is recorded
        # and the A/B moves on.
        rows_options = (128,) if variant == "merge" else (0,)
        for rows in rows_options:
            if rows:
                os.environ["SOT_TPU_MERGE_ROWS"] = str(rows)
            try:
                fwd, grad = make_fns(grid, v)
                fwd_ms = time_call(fwd, us, args.iters)
                grad_ms = time_call(grad, us, args.iters)
            except Exception as e:  # noqa: BLE001 — record, try next config
                results[variant] = {"error": f"{type(e).__name__}: {e}"[:500],
                                    **({"rows": rows} if rows else {})}
                print(f"{variant:10s} FAILED (rows={rows}): {e}", flush=True)
                continue
            results[variant] = {"fwd_ms": round(fwd_ms, 3),
                                "grad_ms": round(grad_ms, 3),
                                **({"rows": rows} if rows else {})}
            print(f"{variant:10s} fwd {fwd_ms:7.3f} ms  grad {grad_ms:7.3f} ms"
                  + (f"  (rows={rows})" if rows else ""), flush=True)
            break
        os.environ.pop("SOT_TPU_MERGE_ROWS", None)
        # incremental write: a timeout mid-variant must not lose the
        # numbers already measured (the file is the bench-gate artifact)
        os.makedirs("results/round2", exist_ok=True)
        with open(f"results/round2/{out_name}", "w") as f:
            json.dump(results, f, indent=1)

    # Completeness flag: the queue's done-marker requires this, so a
    # timeout mid-variant can never permanently satisfy the gate (round-2
    # postmortem: a partial file with only 'plane' blocked the merge A/B).
    results["complete"] = True
    with open(f"results/round2/{out_name}", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
