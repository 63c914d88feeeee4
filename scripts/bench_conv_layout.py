"""Measurement harness: encoder conv-stack layout/precision variants.

Round-4 profile: convolution fusions are the step's #1 HLO category
(2.64 ms of a 9.4 ms step). The Pallas im2col alternative already LOST its
A/B (conv_ab.json) — this harness probes the remaining cheap levers on the
standalone stack (conv1 k=15 + residual prefilt k=15 + three 1x1 convs,
the exact encoder shapes at batch*frames=1024 rows x 285 bins):

  nwc_f32   — current production: NWC layout, f32 activations (MXU still
              computes bf16 under default precision)
  nwc_bf16  — bf16 ACTIVATIONS between layers (halves HBM traffic of the
              ~46 MB intermediates; params stay f32)
  ncw_f32   — NCW layout (channels on the sublane axis instead of bins)

Numbers inform whether a precision/layout change is worth a training A/B;
nothing here is adopted automatically (activations dtype changes training
numerics, so any adoption would need the refgrad-style twin-run protocol).

Usage: python scripts/bench_conv_layout.py [--iters 10]
Writes results/round4/conv_layout.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rows, bins = 1024, 285
    ch = [40, 30, 30, 10, 3]
    k15 = 15
    rng = np.random.default_rng(0)

    def params(dtype):
        p = {
            "w1": rng.standard_normal((k15, 1, ch[0])) * 0.1,
            "wp": rng.standard_normal((k15, ch[0], ch[0])) * 0.05,
            "w2": rng.standard_normal((1, ch[0], ch[1])) * 0.1,
            "w3": rng.standard_normal((1, ch[1], ch[2])) * 0.1,
            "w4": rng.standard_normal((1, ch[2], ch[3])) * 0.1,
            "w5": rng.standard_normal((1, ch[3], ch[4])) * 0.1,
        }
        return {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}

    def conv_nwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))

    def conv_ncw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NCW", "WIO", "NCW"))

    def stack(p, x, conv, act_dtype):
        act = lambda v: jax.nn.leaky_relu(v, 0.3).astype(act_dtype)
        x = act(conv(x.astype(act_dtype), p["w1"]))
        x = act(conv(x, p["wp"])) + x
        x = act(conv(x, p["w2"]))
        x = act(conv(x, p["w3"]))
        x = act(conv(x, p["w4"]))
        return conv(x, p["w5"]).astype(jnp.float32)

    variants = {
        "nwc_f32": (conv_nwc, jnp.float32, (rows, bins, 1)),
        "nwc_bf16": (conv_nwc, jnp.bfloat16, (rows, bins, 1)),
        "ncw_f32": (conv_ncw, jnp.float32, (rows, 1, bins)),
    }

    xs = jnp.asarray(rng.standard_normal((args.k, rows, bins, 1)), jnp.float32)
    results = {"device": str(jax.devices()[0]), "rows": rows, "bins": bins,
               "iters": args.iters, "k": args.k}
    for name, (conv, adt, shape) in variants.items():
        p = params(jnp.float32)
        x_k = xs if name != "ncw_f32" else jnp.swapaxes(xs, 2, 3)

        def loss(p, x):
            return jnp.sum(stack(p, x, conv, adt) ** 2)

        @jax.jit
        def scan_fg(p, xk, c0):
            g = jax.value_and_grad(loss)

            def body(c, x):
                v, gr = g(p, x)
                return c + v + sum(jnp.sum(jnp.abs(t))
                                   for t in jax.tree.leaves(gr)), None
            out, _ = jax.lax.scan(body, c0, xk)
            return out

        try:
            c = scan_fg(p, x_k, jnp.float32(0.0))
            jax.block_until_ready(c)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                c = scan_fg(p, x_k, c)
            jax.block_until_ready(c)
            ms = (time.perf_counter() - t0) / (args.iters * args.k) * 1e3
            results[name] = {"fwd_grad_ms": round(ms, 3)}
            print(f"{name:10s} fwd+grad {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name:10s} FAILED: {e}", flush=True)
        os.makedirs("results/round4", exist_ok=True)
        with open("results/round4/conv_layout.json", "w") as f:
            json.dump(results, f, indent=1)
    results["complete"] = True
    with open("results/round4/conv_layout.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
