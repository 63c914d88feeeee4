"""A/B bench + on-chip parity: XLA resample+oscillator vs fused Pallas synth.

Shapes mirror the SOT-2048 train step's decoder: batch 64, 16 frames, 20
harmonics, 4096 samples. Measures fwd and fwd+grad (the synth sits on the
training path — grads flow to both control tensors), and records value +
gradient agreement between the paths. Unlike refgrad, the parity here is
fp-noise-level rather than exactly 0 (HIGHEST-precision envelope matmuls
vs per-sample lerp; same bf16 phase-prefix class), so kernel_gates
additionally requires the committed training verdict
(synth_train_verdict.json) before `--kernels auto` adopts the gate — the
round-3 gradient-convention lesson applied prospectively.

Usage: python scripts/bench_synth_ab.py [--iters 8] [--k 16]
Writes results/round2/synth_ab.json and prints it.
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
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sot_tpu.models.synths import Sinusoidal

    synth = Sinusoidal(n_samples=4096, sample_rate=16000, amp_scale_fn=None,
                       freq_scale_fn=None, harmonic=True)

    rng = np.random.default_rng(0)
    b, frames, k_harm = 64, 16, 20
    amps = jnp.asarray(rng.uniform(0.01, 1.0, (args.k, b, frames, k_harm)),
                       jnp.float32)
    f0 = jnp.asarray(rng.uniform(40.0, 1950.0, (args.k, b, frames, 1)),
                     jnp.float32)

    def make_fns():
        def render(a, f):
            return synth(a, f)

        @jax.jit
        def fwd_scan(amps, f0s, c0):
            def body(c, af):
                a, f = af
                return c + jnp.sum(render(a, f)), None
            out, _ = jax.lax.scan(body, c0, (amps, f0s))
            return out

        @jax.jit
        def grad_scan(amps, f0s, c0):
            g = jax.grad(lambda a, f: jnp.sum(render(a, f) ** 2), (0, 1))

            def body(c, af):
                ga, gf = g(*af)
                return c + jnp.sum(jnp.abs(ga)) + jnp.sum(jnp.abs(gf)), None
            out, _ = jax.lax.scan(body, c0, (amps, f0s))
            return out

        return fwd_scan, grad_scan

    def time_call(fn, iters):
        c = fn(amps, f0, jnp.float32(0.0))
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(amps, f0, c)
        jax.block_until_ready(c)
        return (time.perf_counter() - t0) / (iters * args.k) * 1e3

    results = {"device": str(jax.devices()[0]), "batch": b, "frames": frames,
               "harmonics": k_harm, "n_samples": 4096, "k": args.k,
               "iters": args.iters}

    # --- parity on one slice: values + grads between the two paths -------
    def val_and_grads(flag):
        os.environ.pop("SOT_TPU_SYNTH_PALLAS", None)
        if flag:
            os.environ["SOT_TPU_SYNTH_PALLAS"] = "1"

        @jax.jit
        def vg(a, f):
            val = synth(a, f)
            ga, gf = jax.grad(
                lambda aa, ff: jnp.sum(synth(aa, ff) ** 2), (0, 1))(a, f)
            return val, ga, gf

        out = [jax.block_until_ready(x) for x in vg(amps[0], f0[0])]
        os.environ.pop("SOT_TPU_SYNTH_PALLAS", None)
        return out

    try:
        v_x, ga_x, gf_x = val_and_grads(False)
        v_p, ga_p, gf_p = val_and_grads(True)

        def rel(a, b):
            return float(jnp.max(jnp.abs(a - b))
                         / (jnp.max(jnp.abs(b)) + 1e-12))

        parity = {"val_max_rel": rel(v_p, v_x),
                  "damp_max_rel": rel(ga_p, ga_x),
                  "dfreq_max_rel": rel(gf_p, gf_x)}
        # bf16-phase reassociation bounds the agreement; anything beyond
        # a few percent of peak indicates a real defect
        parity["ok"] = all(v < 0.05 for v in parity.values())
        results["parity"] = parity
        print(f"parity {parity}", flush=True)
    except Exception as e:  # noqa: BLE001
        results["parity"] = {"error": f"{type(e).__name__}: {e}"[:500],
                             "ok": False}
        print(f"parity FAILED: {e}", flush=True)

    for variant in ("xla", "pallas"):
        os.environ.pop("SOT_TPU_SYNTH_PALLAS", None)
        if variant == "pallas":
            os.environ["SOT_TPU_SYNTH_PALLAS"] = "1"
        try:
            fwd, grad = make_fns()
            fwd_ms = time_call(fwd, args.iters)
            grad_ms = time_call(grad, args.iters)
            results[variant] = {"fwd_ms": round(fwd_ms, 3),
                                "grad_ms": round(grad_ms, 3)}
            print(f"{variant:7s} fwd {fwd_ms:7.3f} ms  grad {grad_ms:7.3f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            results[variant] = {"error": f"{type(e).__name__}: {e}"[:500]}
            print(f"{variant:7s} FAILED: {e}", flush=True)
        finally:
            os.environ.pop("SOT_TPU_SYNTH_PALLAS", None)
        os.makedirs("results/round2", exist_ok=True)
        with open("results/round2/synth_ab.json", "w") as f:
            json.dump(results, f, indent=1)

    results["complete"] = True
    with open("results/round2/synth_ab.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
