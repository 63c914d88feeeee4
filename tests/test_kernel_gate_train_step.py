"""The full train step with EVERY env-gated kernel alternative enabled
(interpret mode) must dispatch cleanly and agree with the default step.

Per-kernel value/grad parity (with kink masking) lives in the dedicated
test files; this is the integration seam: gates are read at trace time
inside the jitted step, and a dispatch bug there (wrong window type, shape
guard miss, gate misrouting inside the loss) would only surface in the
composed trainer. Loss values must agree tightly (all alternatives are
value-parity); parameter updates only loosely (subgradient conventions at
exact CDF ties legitimately differ between the plane and merge kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


ALL_GATES = ("SOT_TPU_W2_MERGE", "SOT_TPU_CONV_PALLAS",
             "SOT_TPU_DFT_MATMUL", "SOT_TPU_STFT_PALLAS")


def _tiny_setup():
    from sot_tpu import data as D
    from sot_tpu.configs import get_experiment
    from sot_tpu.training.trainer import build_modules, init_state, make_train_step

    # hop 128 / T 1024 so the fused STFT frontend actually engages
    cfg = get_experiment("SOT-2048", batch_size=16, cqt_fmin=261.6,
                         transform_n_fft=512, transform_hop=128,
                         n_samples=1024)
    cfg = cfg.replace(losses=tuple(
        l if l.kind != "mss" else
        type(l)(**{**l.__dict__, "fft_sizes": (512, 256)})
        for l in cfg.losses))
    mod = build_modules(cfg)
    rng = jax.random.key(0)
    state = init_state(mod, rng)
    signals, _, _ = D.generate_sinusoid_dataset(
        seed=0, size=16, n_samples=1024, render_batch=16)
    x = jnp.asarray(D.peak_normalize(signals))
    return mod, state, x, rng, make_train_step


def test_train_step_with_all_gates_enabled(monkeypatch):
    mod, state_a, x, rng, make_train_step = _tiny_setup()
    state_b = jax.tree.map(lambda v: v.copy(), state_a)

    step = make_train_step(mod)
    state_a, logs_a = step(state_a, x, rng)

    monkeypatch.setenv("SOT_TPU_PALLAS_INTERPRET", "1")
    for gate in ALL_GATES:
        monkeypatch.setenv(gate, "1")
    gated = make_train_step(mod)  # fresh jit closure -> fresh trace
    state_b, logs_b = gated(state_b, x, rng)

    # the merge form evaluates W2 as (large marginal terms) - 2*(coupling),
    # so its VALUE carries an fp32 cancellation floor relative to the
    # plane form (see test_sot_merge tolerances) — observed ~2e-3 rel here
    np.testing.assert_allclose(float(logs_b["loss/total"]),
                               float(logs_a["loss/total"]), rtol=8e-3)
    for leaf in jax.tree.leaves(state_b.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # updates agree except tie-convention noise (Adam step ~ sign(g)*lr)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)
