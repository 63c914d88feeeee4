"""Synth + encoder: parity with the reference torch modules / param counts."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests._reference import import_reference
from sot_tpu.models.synths import Sinusoidal
from sot_tpu.models.encoder import PESTOEncoder, predict_pitch, ToeplitzLinear


def test_sinusoidal_matches_reference_harmonic():
    """Frozen data-generator configuration: harmonic, no scaling fns."""
    ref_synths = import_reference("synths")
    rng = np.random.default_rng(0)
    amps = rng.uniform(0.2, 1.0, (3, 16, 8)).astype(np.float32)
    f0 = rng.uniform(40, 1950, (3, 16, 1)).astype(np.float32)

    ref = ref_synths.Sinusoidal(4096, sample_rate=16000, amp_scale_fn=None,
                                freq_scale_fn=None, harmonic=True)
    ref_out = ref(torch.as_tensor(amps), torch.as_tensor(f0)).numpy()

    mine = Sinusoidal(n_samples=4096, sample_rate=16000, amp_scale_fn=None,
                      freq_scale_fn=None, harmonic=True)
    my_out = np.asarray(mine(jnp.asarray(amps), jnp.asarray(f0)))

    assert my_out.shape == ref_out.shape == (3, 4096)
    np.testing.assert_allclose(my_out, ref_out, atol=1e-2)  # fp32 cumsum ordering


def test_sinusoidal_exp_sigmoid_scaling_matches_reference():
    ref_synths = import_reference("synths")
    rng = np.random.default_rng(1)
    amps = rng.standard_normal((2, 16, 8)).astype(np.float32)
    f0 = rng.uniform(60, 800, (2, 16, 1)).astype(np.float32)

    ref = ref_synths.Sinusoidal(4096, sample_rate=16000, amp_scale_fn="exp_sigmoid",
                                freq_scale_fn=None, harmonic=True)
    ref_out = ref(torch.as_tensor(amps), torch.as_tensor(f0)).numpy()
    mine = Sinusoidal(n_samples=4096, sample_rate=16000, amp_scale_fn="exp_sigmoid",
                      freq_scale_fn=None, harmonic=True)
    my_out = np.asarray(mine(jnp.asarray(amps), jnp.asarray(f0)))
    np.testing.assert_allclose(my_out, ref_out, atol=1e-2)  # fp32 cumsum ordering


def test_sinusoidal_rolloff_runs():
    mine = Sinusoidal(n_samples=4096, sample_rate=16000, amp_scale_fn=None,
                      freq_scale_fn=None, harmonic=True, apply_roll_off=True)
    amps = jnp.ones((1, 16, 8)) * 0.5
    f0 = jnp.full((1, 16, 1), 220.0)
    out = mine(amps, f0)
    assert out.shape == (1, 4096)
    assert np.isfinite(np.asarray(out)).all()


def test_sinusoidal_nyquist_masking():
    """Harmonics above Nyquist contribute nothing."""
    base = Sinusoidal(n_samples=1024, sample_rate=16000, amp_scale_fn=None,
                      freq_scale_fn=None, harmonic=True)
    amps = jnp.ones((1, 4, 8))
    out_low = base(amps, jnp.full((1, 4, 1), 100.0))   # all harmonics < 800 Hz
    out_high = base(amps, jnp.full((1, 4, 1), 3000.0))  # harmonics 3..8 masked
    # energy of the high-f0 signal reflects only 2 active harmonics
    assert np.square(np.asarray(out_high)).mean() < np.square(np.asarray(out_low)).mean()


def test_encoder_param_count_and_shapes():
    enc = PESTOEncoder(n_bins_in=285, output_size=285, n_modes=20,
                       output_splits=("frequency", "weights"), harmonic=True)
    params = enc.init(jax.random.key(0), jnp.zeros((4, 285)))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # reference architecture parameter count (README: "46k parameters"):
    # layernorm 570 + conv1 640 + prefilt 24040 + conv2 1230 + conv3 930
    # + conv4 310+33 + frequency toeplitz 1139 + weights dense 17120 = 46012
    assert n_params == 46012, n_params

    out = enc.apply(params, jnp.zeros((4, 285)))
    assert out["frequency"].shape == (4, 285)
    assert out["weights"].shape == (4, 20)
    # weights pass through exp_sigmoid -> (1e-7, 2]
    w = np.asarray(out["weights"])
    assert (w > 0).all() and (w <= 2.0 + 1e-6).all()


def test_toeplitz_linear_matches_torch_conv():
    """Our gather+matmul Toeplitz == the reference's Conv1d formulation."""
    ref_encoder = import_reference("encoder")
    in_f, out_f = 12, 5
    tl_ref = ref_encoder.ToeplitzLinear(in_f, out_f)
    w = tl_ref.weight.detach().numpy().reshape(-1)  # (in+out-1,)

    tl = ToeplitzLinear(in_f, out_f)
    params = tl.init(jax.random.key(0), jnp.zeros((2, in_f)))
    params = jax.tree.map(lambda _: jnp.asarray(w), params)

    x = np.random.default_rng(2).standard_normal((2, in_f)).astype(np.float32)
    mine = tl.apply(params, jnp.asarray(x))
    ref = tl_ref(torch.as_tensor(x)).detach().numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_encoder_dropout_train_vs_eval():
    enc = PESTOEncoder()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 285)),
                    dtype=jnp.float32)
    params = enc.init(jax.random.key(0), x)
    eval_out = enc.apply(params, x)
    eval_out2 = enc.apply(params, x)
    np.testing.assert_allclose(eval_out["frequency"], eval_out2["frequency"])
    train_out = enc.apply(params, x, train=True,
                          rngs={"dropout": jax.random.key(1)})
    assert not np.allclose(train_out["frequency"], eval_out["frequency"])


def test_predict_pitch_soft_argmax():
    # peaked logits -> expectation at the peak position
    logits = np.full((3, 285), -10.0, np.float32)
    for i, b in enumerate((0, 142, 284)):
        logits[i, b] = 10.0
    out = predict_pitch(jnp.asarray(logits), temperature=0.1)
    expect = np.array([0.0, 142 / 284, 1.0])
    np.testing.assert_allclose(np.asarray(out["pitch_unit"])[:, 0], expect, atol=1e-3)
    probs = np.asarray(out["probabilities"])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_predict_pitch_matches_reference():
    ref_encoder = import_reference("encoder")
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((6, 285)).astype(np.float32)

    ref_enc = ref_encoder.PESTOEncoder.__new__(ref_encoder.PESTOEncoder)
    ref_enc.estimation_type = "soft-argmax"
    ref_out = ref_enc.predict_pitch(torch.as_tensor(logits), temperature=0.1)

    mine = predict_pitch(jnp.asarray(logits), temperature=0.1)
    np.testing.assert_allclose(np.asarray(mine["pitch_unit"]),
                               ref_out["pitch_unit"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mine["probabilities"]),
                               ref_out["probabilities"].numpy(), atol=1e-5)


def test_encoder_grad_flows():
    enc = PESTOEncoder()
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 285)),
                    dtype=jnp.float32)
    params = enc.init(jax.random.key(0), x)

    def loss(p):
        out = enc.apply(p, x)
        pitch = predict_pitch(out["frequency"], temperature=0.1)["pitch_unit"]
        return jnp.sum(pitch**2) + jnp.sum(out["weights"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter receives gradient somewhere
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


@pytest.mark.slow
def test_detach_weights_reference_semantics():
    """detach_weights renders a second weights-detached signal fed only to
    the Wasserstein term; MSS still trains the amplitude head
    (reference trainer.py:136-141, 216-218)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sot_tpu import data as D
    from sot_tpu.configs import get_experiment
    from sot_tpu.training.trainer import build_modules, compute_loss, init_state

    cfg = get_experiment("SOT-512", batch_size=4, n_samples=1024,
                         cqt_fmin=261.6, detach_weights=True)
    mod = build_modules(cfg)
    state = init_state(mod, jax.random.key(0))
    signals, _, _ = D.generate_sinusoid_dataset(seed=0, size=4, n_samples=1024,
                                                render_batch=4)
    x = jnp.asarray(D.peak_normalize(signals))

    grads = jax.grad(lambda p: compute_loss(mod, p, x)[0])(state.params)
    gw = np.asarray(grads["params"]["weights"]["Dense_0"]["kernel"])
    # MSS term still reaches the amplitude head
    assert np.abs(gw).max() > 0

    # with the MSS term removed, the weights head must receive zero gradient
    cfg2 = cfg.replace(losses=tuple(l for l in cfg.losses
                                    if l.kind == "wasserstein"))
    mod2 = build_modules(cfg2)
    grads2 = jax.grad(lambda p: compute_loss(mod2, p, x)[0])(state.params)
    gw2 = np.asarray(grads2["params"]["weights"]["Dense_0"]["kernel"])
    assert np.abs(gw2).max() == 0.0
