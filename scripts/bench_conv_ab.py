"""A/B bench: encoder forward+backward with XLA convs vs the Pallas
im2col conv kernel (SOT_TPU_CONV_PALLAS=1, ops/pallas/conv.py) at
training shapes ([batch*frames = 1024, 285] CQT frames).

Honest-timing protocol (.claude/skills/verify/SKILL.md): carry-chained
dispatches over K distinct input slices so the remote tunnel's
identical-arg result cache cannot elide iterations.

Usage: python scripts/bench_conv_ab.py [--iters 8] [--k 8]
Writes results/round2/conv_ab.json and prints it.
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

    from sot_tpu.models.encoder import PESTOEncoder

    enc = PESTOEncoder(n_bins_in=285, output_size=285)
    params = enc.init(jax.random.key(0), jnp.zeros((8, 285), jnp.float32))

    def head(p, x):
        out = enc.apply(p, x)
        return sum(jnp.sum(v) for v in out.values())

    @jax.jit
    def fwd_scan(xs, c0):
        def body(c, x):
            return c + head(params, x), None
        out, _ = jax.lax.scan(body, c0, xs)
        return out

    g = jax.grad(head, argnums=(0, 1))

    @jax.jit
    def grad_scan(xs, c0):
        def body(c, x):
            gp, gx = g(params, x)
            leaves = jax.tree_util.tree_leaves(gp)
            return c + jnp.sum(gx) + sum(jnp.sum(l) for l in leaves), None
        out, _ = jax.lax.scan(body, c0, xs)
        return out

    return fwd_scan, grad_scan


def time_call(fn, xs, iters: int):
    import jax
    import jax.numpy as jnp

    c = fn(xs, jnp.float32(0.0))  # compile + warm
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(xs, c)  # chained carry: distinct args each dispatch
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / (iters * xs.shape[0]) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    xs = jax.random.normal(jax.random.key(1), (args.k, 1024, 285),
                           jnp.float32)
    results = {"device": str(jax.devices()[0]), "rows": 1024, "bins": 285,
               "k": args.k, "iters": args.iters}
    for variant in ("xla", "pallas"):
        os.environ.pop("SOT_TPU_CONV_PALLAS", None)
        if variant == "pallas":
            os.environ["SOT_TPU_CONV_PALLAS"] = "1"
        try:
            fwd, grad = make_fns()
            fwd_ms = time_call(fwd, xs, args.iters)
            grad_ms = time_call(grad, xs, args.iters)
        except Exception as e:  # noqa: BLE001 — one-shot unattended run
            results[variant] = {"error": f"{type(e).__name__}: {e}"[:500]}
            print(f"{variant:7s} FAILED: {e}", flush=True)
            continue
        results[variant] = {"fwd_ms": round(fwd_ms, 3),
                            "grad_ms": round(grad_ms, 3)}
        print(f"{variant:7s} fwd {fwd_ms:7.3f} ms  grad {grad_ms:7.3f} ms",
              flush=True)
        os.makedirs("results/round2", exist_ok=True)
        with open("results/round2/conv_ab.json", "w") as f:
            json.dump(results, f, indent=1)
    os.environ.pop("SOT_TPU_CONV_PALLAS", None)
    results["complete"] = True
    os.makedirs("results/round2", exist_ok=True)
    with open("results/round2/conv_ab.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
