"""A/B bench + on-chip parity: hybrid vs ref merge modes at paper shapes.

Both variants share the O(n log n) merge FORWARD; they differ in the
training backward (target-constant, the only case the sweep exercises):
  hybrid — banded-plane Pallas backward (~3.8 ms, the step's dominant op)
  ref    — ops/pallas/refgrad.py rank-query backward: the SAME gradient
           convention in O(n log n) (two bitonic merges + scans + fills)

Because ref reproduces the plane convention EXACTLY (unlike full merge's
min-halving subgradients, which lost a training A/B — see
merge_train_verdict.json), a numerical parity check at the production
shape is sufficient evidence of training safety; no 25k run needed.
The script therefore records max-abs-relative gradient disagreement
between the two modes on one real data slice, kinks included, and
kernel_gates refuses to adopt ref unless parity_ok.

Measurement notes as in bench_sot_ab.py (.claude/skills/verify/SKILL.md):
carry-chained scans over K distinct slices per dispatch defeat the
tunnel's identical-arg result cache.

Usage: python scripts/bench_refgrad_ab.py [--iters 8] [--k 16]
Writes results/round2/refgrad_ab.json and prints it.
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

from bench_sot_ab import build_data, make_fns, time_call  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--n-fft", type=int, default=2048,
                    help="loss-STFT size (512 for the SOT-512 families); "
                         "non-default writes refgrad_ab_<n_fft>.json")
    args = ap.parse_args()
    out_path = ("results/round2/refgrad_ab.json" if args.n_fft == 2048
                else f"results/round2/refgrad_ab_{args.n_fft}.json")

    import jax
    import jax.numpy as jnp

    from sot_tpu.ops.pallas.sot import wasserstein_same_grid

    grid, us, v = build_data(args.k, args.n_fft)
    results = {"device": str(jax.devices()[0]),
               "rows": int(v.shape[0]), "bins": int(v.shape[1]),
               "k": args.k, "iters": args.iters}

    # --- parity first: grads of the real training loss on one slice ------
    def grad_with_mode(mode):
        os.environ["SOT_TPU_W2_MERGE"] = mode

        @jax.jit
        def g(u):
            return jax.grad(lambda uu: jnp.sum(wasserstein_same_grid(
                grid, v, uu, p=2.0, limit_quantile_range=True,
                target_constant=True)))(u)

        out = jax.block_until_ready(g(us[0]))
        os.environ.pop("SOT_TPU_W2_MERGE", None)
        return out

    try:
        g_ref = grad_with_mode("ref")
        g_hyb = grad_with_mode("hybrid")
        scale = float(jnp.max(jnp.abs(g_hyb))) + 1e-12
        max_rel = float(jnp.max(jnp.abs(g_ref - g_hyb))) / scale
        # fp32 noise between reduction orders at these magnitudes; the
        # conventions are identical so anything above this is a bug
        results["parity"] = {"max_rel": max_rel, "ok": max_rel < 1e-4}
        print(f"parity     max_rel {max_rel:.3e} "
              f"({'OK' if max_rel < 1e-4 else 'FAIL'})", flush=True)
    except Exception as e:  # noqa: BLE001 — record and continue to timing
        results["parity"] = {"error": f"{type(e).__name__}: {e}"[:500],
                             "ok": False}
        print(f"parity     FAILED: {e}", flush=True)

    # --- timing ----------------------------------------------------------
    for variant in ("hybrid", "ref"):
        os.environ["SOT_TPU_W2_MERGE"] = variant
        try:
            fwd, grad = make_fns(grid, v)
            fwd_ms = time_call(fwd, us, args.iters)
            grad_ms = time_call(grad, us, args.iters)
            results[variant] = {"fwd_ms": round(fwd_ms, 3),
                                "grad_ms": round(grad_ms, 3)}
            print(f"{variant:10s} fwd {fwd_ms:7.3f} ms  "
                  f"grad {grad_ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            results[variant] = {"error": f"{type(e).__name__}: {e}"[:500]}
            print(f"{variant:10s} FAILED: {e}", flush=True)
        finally:
            os.environ.pop("SOT_TPU_W2_MERGE", None)
        os.makedirs("results/round2", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    results["complete"] = True
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
