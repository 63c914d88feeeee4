"""End-to-end gradient parity vs the reference implementation.

The definitive convergence-parity check: initialise OUR encoder, copy its
weights into the reference torch encoder, feed both pipelines the SAME batch
and the SAME CQT features, compute the SOT-2048 training loss (0.05*MSS +
1.0*W1D on flattop-2048 spectra) through encoder -> soft-argmax ->
unit_to_hz -> frozen Sinusoidal synth -> STFT -> losses on both sides, and
compare the loss values AND the gradients of every encoder parameter.

Reference chain assembled manually from its modules (no Lightning):
encoder.PESTOEncoder, utils.unit_to_hz, synths.Sinusoidal,
features.compute_mag, losses.{MSSLoss, Wasserstein1D}
(reference trainer.py:77-257 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests._reference import import_reference

from sot_tpu import data as data_lib
from sot_tpu.configs import get_experiment
from sot_tpu.training.trainer import build_modules, compute_loss, init_state


def _copy_flax_to_torch(params, tenc, n_prefilt_layers=2):
    """Map our flax param tree onto the reference PESTOEncoder state."""
    p = params["params"]

    def t(x):
        return torch.as_tensor(np.asarray(x))

    with torch.no_grad():
        # LayerNorm([1, 285]): ours has feature shape [285, 1]
        tenc.layernorm.weight.copy_(t(p["LayerNorm_0"]["scale"]).permute(1, 0))
        tenc.layernorm.bias.copy_(t(p["LayerNorm_0"]["bias"]).permute(1, 0))

        def copy_conv(tconv, fparams):
            # flax NWC kernel [k, in, out] -> torch [out, in, k]
            tconv.weight.copy_(t(fparams["Conv_0"]["kernel"]).permute(2, 1, 0))
            tconv.bias.copy_(t(fparams["Conv_0"]["bias"]))

        copy_conv(tenc.conv1[0], p["conv1"])
        for i in range(n_prefilt_layers - 1):
            copy_conv(tenc.prefilt_list[i][0], p[f"prefilt{i}"])
        copy_conv(tenc.conv2[0], p["conv2"])
        copy_conv(tenc.conv3[0], p["conv3"])
        copy_conv(tenc.conv4[0], p["conv4a"])
        copy_conv(tenc.conv4[3], p["conv4b"])

        tenc.linear["frequency"][0].weight.copy_(
            t(p["frequency0"]["kernel"])[None, None, :])
        tenc.linear["weights"][0].weight.copy_(
            t(p["weights"]["Dense_0"]["kernel"]).permute(1, 0))
        tenc.linear["weights"][0].bias.copy_(t(p["weights"]["Dense_0"]["bias"]))


@pytest.mark.slow
def test_sot2048_loss_and_gradient_parity():
    ref_encoder = import_reference("encoder")
    ref_utils = import_reference("utils")
    ref_synths = import_reference("synths")
    ref_features = import_reference("features")
    ref_losses = import_reference("losses")

    cfg = get_experiment("SOT-2048", batch_size=6)
    mod = build_modules(cfg)
    state = init_state(mod, jax.random.key(3))

    signals, _, _ = data_lib.generate_sinusoid_dataset(
        seed=11, size=6, n_samples=cfg.n_samples, render_batch=6)
    x_np = data_lib.peak_normalize(signals).astype(np.float32)
    x = jnp.asarray(x_np)

    # ---- our side: loss + grads (eval mode: no dropout) ----
    def loss_fn(params):
        loss, _ = compute_loss(mod, params, x, train=False)
        return loss

    our_loss, our_grads = jax.value_and_grad(loss_fn)(state.params)
    our_loss = float(our_loss)

    # ---- reference side ----
    tenc = ref_encoder.PESTOEncoder(
        n_bins_in=285, output_size=285, n_modes=20,
        output_splits=["frequency", "weights"], harmonic=True,
        n_chan_layers=[40, 30, 30, 10, 3], n_prefilt_layers=2,
        residual=True, kernel_size=15, activation_fn="leaky", a_lrelu=0.3,
        estimation_type="soft-argmax",
    )
    _copy_flax_to_torch(state.params, tenc)
    tenc.eval()

    feats = np.asarray(mod.feature_extractor(x[:, :-1]))  # same CQT features
    batch, n_frames, n_bins = feats.shape
    tf = torch.as_tensor(feats.reshape(batch * n_frames, n_bins))

    z = tenc(tf)
    pitch_unit = tenc.predict_pitch(z["frequency"], temperature=0.1)["pitch_unit"]
    pitch_hz = ref_utils.unit_to_hz(pitch_unit, hz_min=mod.freq_hz_min,
                                    hz_max=mod.freq_hz_max)
    weights = z["weights"].reshape(batch, n_frames, -1)
    pitch_hz = pitch_hz.reshape(batch, n_frames, -1)

    synth = ref_synths.Sinusoidal(
        n_samples=cfg.n_samples, sample_rate=cfg.sample_rate,
        amp_scale_fn=None, freq_scale_fn=None, harmonic=True)
    x_hat = synth(weights, pitch_hz)

    tx = torch.as_tensor(x_np)
    from scipy.signal import get_window as scipy_get_window

    flattop = torch.as_tensor(
        scipy_get_window("flattop", 2048, fftbins=True).astype(np.float32))
    spec = lambda sig: ref_features.compute_mag(
        sig, size=2048, overlap=1 - 256 / 2048, window=flattop,
        pad_end=True, center=False).permute(0, 2, 1)
    spec_x, spec_x_hat = spec(tx), spec(x_hat)

    freqs = np.fft.rfftfreq(2048, 1 / cfg.sample_rate).astype(np.float32)
    pos = torch.as_tensor(freqs / freqs.max())
    w1d = ref_losses.Wasserstein1D(p=2, square_dist=True, dont_normalize=True,
                                   limit_quantile_range=True)
    mss = ref_losses.MSSLoss(fft_sizes=(2048, 1024, 512, 256, 128, 64),
                             loss_type="L1", mag_weight=1.0)
    ref_loss = 0.05 * mss(tx, x_hat) + 1.0 * w1d(spec_x, spec_x_hat,
                                                 x_pos=pos, y_pos=pos)
    ref_loss.backward()

    # loss parity
    np.testing.assert_allclose(our_loss, float(ref_loss), rtol=2e-4)

    # gradient parity for every encoder parameter
    p = our_grads["params"]
    pairs = [
        ("layernorm.weight", tenc.layernorm.weight.grad.permute(1, 0),
         p["LayerNorm_0"]["scale"]),
        ("layernorm.bias", tenc.layernorm.bias.grad.permute(1, 0),
         p["LayerNorm_0"]["bias"]),
        ("conv1.w", tenc.conv1[0].weight.grad.permute(2, 1, 0),
         p["conv1"]["Conv_0"]["kernel"]),
        ("prefilt0.w", tenc.prefilt_list[0][0].weight.grad.permute(2, 1, 0),
         p["prefilt0"]["Conv_0"]["kernel"]),
        ("conv2.w", tenc.conv2[0].weight.grad.permute(2, 1, 0),
         p["conv2"]["Conv_0"]["kernel"]),
        ("conv3.w", tenc.conv3[0].weight.grad.permute(2, 1, 0),
         p["conv3"]["Conv_0"]["kernel"]),
        ("conv4a.w", tenc.conv4[0].weight.grad.permute(2, 1, 0),
         p["conv4a"]["Conv_0"]["kernel"]),
        ("conv4b.w", tenc.conv4[3].weight.grad.permute(2, 1, 0),
         p["conv4b"]["Conv_0"]["kernel"]),
        ("toeplitz.w", tenc.linear["frequency"][0].weight.grad[0, 0],
         p["frequency0"]["kernel"]),
        ("weights.w", tenc.linear["weights"][0].weight.grad.permute(1, 0),
         p["weights"]["Dense_0"]["kernel"]),
        ("weights.b", tenc.linear["weights"][0].bias.grad,
         p["weights"]["Dense_0"]["bias"]),
    ]
    errs = {}
    for name, tgrad, jgrad in pairs:
        tg = np.asarray(tgrad.detach())
        jg = np.asarray(jgrad)
        assert tg.shape == jg.shape, (name, tg.shape, jg.shape)
        scale = np.abs(tg).max() + 1e-12
        errs[name] = np.abs(tg - jg).max() / scale
    # fp32 fwd+bwd across two frameworks (different FFTs, reduction orders)
    # accumulates ~1e-3 relative noise; systematic bugs show up as O(0.1+).
    bad = {k: f"{v:.2e}" for k, v in errs.items() if v > 2e-2}
    assert not bad, f"gradient parity failures: {bad} (all: {errs})"
