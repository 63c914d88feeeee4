"""Multi-step training-dynamics parity vs the reference (CPU).

Runs N Adam steps of SOT-2048 training in BOTH frameworks from identical
weights on an identical fixed batch sequence (dropout off for exact
comparability) and prints both loss curves. Single-step gradient parity is
covered by tests/test_e2e_parity.py; this script shows the trajectories
track until fp32 chaos separates them.

    python scripts/compare_reference_training.py [--steps 200] [--batch 8]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
import optax
import torch

from _reference import import_reference

from sot_tpu import data as data_lib
from sot_tpu.configs import get_experiment
from sot_tpu.training.trainer import build_modules, compute_loss, init_state
from test_e2e_parity import _copy_flax_to_torch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-batches", type=int, default=8)
    args = ap.parse_args()

    ref_encoder = import_reference("encoder")
    ref_utils = import_reference("utils")
    ref_synths = import_reference("synths")
    ref_features = import_reference("features")
    ref_losses = import_reference("losses")
    from scipy.signal import get_window as scipy_get_window

    cfg = get_experiment("SOT-2048", batch_size=args.batch)
    # dropout off for determinism on both sides
    mod = build_modules(cfg)
    import dataclasses as _dc
    enc0 = mod.encoder
    enc_nodrop = type(enc0)(**{f.name: getattr(enc0, f.name)
                               for f in _dc.fields(enc0) if f.name != "parent"
                               and f.name != "name"} | {"p_dropout": 0.0})
    mod = _dc.replace(mod, encoder=enc_nodrop)
    state = init_state(mod, jax.random.key(0))

    signals, _, _ = data_lib.generate_sinusoid_dataset(
        seed=5, size=args.batch * args.n_batches, n_samples=cfg.n_samples,
        render_batch=args.batch)
    x_all = data_lib.peak_normalize(signals).astype(np.float32)

    # ---- our side ----
    opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                      optax.scale_by_adam(), optax.scale(-cfg.learning_rate))
    opt_state = opt.init(state.params)
    params = state.params

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            loss, _ = compute_loss(mod, p, x, train=False)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    for i in range(args.steps):
        x = jnp.asarray(x_all[(i % args.n_batches) * args.batch:
                              (i % args.n_batches + 1) * args.batch])
        params, opt_state, loss = step(params, opt_state, x)
        our_losses.append(float(loss))

    # ---- reference side ----
    tenc = ref_encoder.PESTOEncoder(
        n_bins_in=285, output_size=285, n_modes=20,
        output_splits=["frequency", "weights"], harmonic=True,
        n_chan_layers=[40, 30, 30, 10, 3], n_prefilt_layers=2,
        residual=True, kernel_size=15, activation_fn="leaky", a_lrelu=0.3,
        estimation_type="soft-argmax",
    )
    _copy_flax_to_torch(state.params, tenc)
    tenc.train()  # dropout module exists but we never enable p>0 paths
    for m in tenc.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    synth = ref_synths.Sinusoidal(
        n_samples=cfg.n_samples, sample_rate=cfg.sample_rate,
        amp_scale_fn=None, freq_scale_fn=None, harmonic=True)
    flattop = torch.as_tensor(
        scipy_get_window("flattop", 2048, fftbins=True).astype(np.float32))
    w1d = ref_losses.Wasserstein1D(p=2, square_dist=True, dont_normalize=True,
                                   limit_quantile_range=True)
    mss = ref_losses.MSSLoss(fft_sizes=(2048, 1024, 512, 256, 128, 64),
                             loss_type="L1", mag_weight=1.0)
    freqs = np.fft.rfftfreq(2048, 1 / cfg.sample_rate).astype(np.float32)
    pos = torch.as_tensor(freqs / freqs.max())
    optim = torch.optim.Adam(tenc.parameters(), lr=cfg.learning_rate,
                             weight_decay=cfg.weight_decay)

    # feature extraction shared (our CQT, precomputed per batch)
    feats_all = []
    for b in range(args.n_batches):
        xb = jnp.asarray(x_all[b * args.batch:(b + 1) * args.batch])
        feats_all.append(np.asarray(mod.feature_extractor(xb[:, :-1])))

    ref_losses_curve = []
    for i in range(args.steps):
        b = i % args.n_batches
        feats = torch.as_tensor(feats_all[b])
        tx = torch.as_tensor(x_all[b * args.batch:(b + 1) * args.batch])
        batch, n_frames, n_bins = feats.shape
        z = tenc(feats.reshape(batch * n_frames, n_bins))
        pitch_unit = tenc.predict_pitch(z["frequency"],
                                        temperature=0.1)["pitch_unit"]
        pitch_hz = ref_utils.unit_to_hz(pitch_unit, hz_min=mod.freq_hz_min,
                                        hz_max=mod.freq_hz_max)
        weights = z["weights"].reshape(batch, n_frames, -1)
        pitch_hz = pitch_hz.reshape(batch, n_frames, -1)
        x_hat = synth(weights, pitch_hz)
        spec = lambda sig: ref_features.compute_mag(
            sig, size=2048, overlap=1 - 256 / 2048, window=flattop,
            pad_end=True, center=False).permute(0, 2, 1)
        loss = 0.05 * mss(tx, x_hat) + w1d(spec(tx), spec(x_hat),
                                           x_pos=pos, y_pos=pos)
        optim.zero_grad()
        loss.backward()
        optim.step()
        ref_losses_curve.append(float(loss))

    ours = np.array(our_losses)
    refs = np.array(ref_losses_curve)
    rel = np.abs(ours - refs) / np.abs(refs)
    print("step     ours        ref        rel")
    for i in list(range(0, min(10, args.steps))) + list(
            range(10, args.steps, max(args.steps // 12, 1))):
        print(f"{i:5d}  {ours[i]:.6f}  {refs[i]:.6f}  {rel[i]:.2e}")
    print(f"\nmax rel diff over first 50 steps: {rel[:50].max():.3e}")
    print(f"final losses: ours={ours[-1]:.6f} ref={refs[-1]:.6f}")


if __name__ == "__main__":
    main()
