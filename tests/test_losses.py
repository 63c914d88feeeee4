"""Loss modules vs the reference torch implementations on identical inputs."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from tests._reference import import_reference
from sot_tpu.losses import (
    Wasserstein1D,
    MSSLoss,
    MixOfLosses,
    KL,
    MeanDifference,
    Wasserstein1DWithTransform,
)
from sot_tpu.ops.stft import stft_magnitude, rfft_frequencies


def _spectra(rng, batch=4, frames=6, bins=257):
    x = rng.uniform(0, 1, (batch, frames, bins)).astype(np.float32)
    y = rng.uniform(0, 1, (batch, frames, bins)).astype(np.float32)
    return x, y


def test_wasserstein_module_paper_config_matches_reference():
    """p=2, square_dist, dont_normalize, limit_quantile_range (SOT-2048)."""
    ref_losses = import_reference("losses")
    rng = np.random.default_rng(0)
    x, y = _spectra(rng)
    pos = np.sort(rng.uniform(0, 1, 257)).astype(np.float32)

    ref = ref_losses.Wasserstein1D(p=2, square_dist=True, dont_normalize=True,
                                   limit_quantile_range=True)
    ref_out = ref(torch.as_tensor(x), torch.as_tensor(y),
                  x_pos=torch.as_tensor(pos), y_pos=torch.as_tensor(pos))

    mine = Wasserstein1D(p=2, square_dist=True, dont_normalize=True,
                         limit_quantile_range=True)
    my_out = mine(jnp.asarray(x), jnp.asarray(y), x_pos=jnp.asarray(pos),
                  y_pos=jnp.asarray(pos))
    np.testing.assert_allclose(float(my_out), float(ref_out), rtol=1e-4)


def test_wasserstein_module_normalized_variant():
    ref_losses = import_reference("losses")
    rng = np.random.default_rng(1)
    x, y = _spectra(rng, bins=129)
    pos = np.linspace(0, 1, 129).astype(np.float32)
    ref = ref_losses.Wasserstein1D(p=2, square_dist=True)
    ref_out = ref(torch.as_tensor(x), torch.as_tensor(y),
                  x_pos=torch.as_tensor(pos), y_pos=torch.as_tensor(pos))
    mine = Wasserstein1D(p=2, square_dist=True)
    my_out = mine(jnp.asarray(x), jnp.asarray(y), x_pos=jnp.asarray(pos),
                  y_pos=jnp.asarray(pos))
    np.testing.assert_allclose(float(my_out), float(ref_out), rtol=1e-4)


def test_wasserstein_fixed_x():
    ref_losses = import_reference("losses")
    rng = np.random.default_rng(2)
    x, y = _spectra(rng, bins=65)
    ref = ref_losses.Wasserstein1D(p=1, fixed_x=65)
    ref_out = ref(torch.as_tensor(x), torch.as_tensor(y))
    mine = Wasserstein1D(p=1, fixed_x=65)
    my_out = mine(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(my_out), float(ref_out), rtol=1e-4)


def test_mss_loss_matches_reference():
    ref_losses = import_reference("losses")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    y = rng.standard_normal((2, 4096)).astype(np.float32)

    ref = ref_losses.MSSLoss(fft_sizes=(2048, 1024, 512, 256, 128, 64),
                             loss_type="L1", mag_weight=1.0, logmag_weight=0.0)
    ref_out = ref(torch.as_tensor(x), torch.as_tensor(y))
    mine = MSSLoss(fft_sizes=(2048, 1024, 512, 256, 128, 64), loss_type="L1",
                   mag_weight=1.0, logmag_weight=0.0)
    my_out = mine(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(my_out), float(ref_out), rtol=1e-4)


def test_mss_loss_logmag_matches_reference():
    ref_losses = import_reference("losses")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    y = rng.standard_normal((2, 4096)).astype(np.float32)
    ref = ref_losses.MSSLoss(fft_sizes=(512, 64), loss_type="L1",
                             mag_weight=1.0, logmag_weight=1.0)
    ref_out = ref(torch.as_tensor(x), torch.as_tensor(y))
    mine = MSSLoss(fft_sizes=(512, 64), loss_type="L1", mag_weight=1.0,
                   logmag_weight=1.0)
    np.testing.assert_allclose(float(mine(jnp.asarray(x), jnp.asarray(y))),
                               float(ref_out), rtol=1e-4)


def test_kl_matches_reference():
    ref_losses = import_reference("losses")
    rng = np.random.default_rng(5)
    x, y = _spectra(rng, bins=65)
    ref_out = ref_losses.KL()(torch.as_tensor(x), torch.as_tensor(y))
    my_out = KL()(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(my_out), float(ref_out), rtol=1e-4)
    ref_rev = ref_losses.KL(reverse=True)(torch.as_tensor(x), torch.as_tensor(y))
    my_rev = KL(reverse=True)(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(my_rev), float(ref_rev), rtol=1e-4)


def test_mean_difference_sorted():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 32)).astype(np.float32)
    y = rng.standard_normal((3, 32)).astype(np.float32)
    md = MeanDifference("L2")
    out_sorted = md(jnp.asarray(x), jnp.asarray(y), sort=True)
    ref = np.mean((np.sort(x, -1) - np.sort(y, -1)) ** 2)
    np.testing.assert_allclose(float(out_sorted), ref, rtol=1e-5)


def test_mix_of_losses_keys_and_weighting():
    mss = MSSLoss(fft_sizes=(256,), mag_weight=1.0)
    w1d = Wasserstein1D(p=2, fixed_x=129)
    mix = MixOfLosses(losses=(mss, w1d), weights=(0.05, 1.0))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    # MixOfLosses applies each loss to the *same* inputs; here both accept audio
    sx = stft_magnitude(x, size=256)
    sy = stft_magnitude(y, size=256)
    out = mix(sx, sy)
    assert set(out.keys()) == {"MSSLoss", "Wasserstein1D"}
    # the W1D term carries weight 1.0
    np.testing.assert_allclose(float(out["Wasserstein1D"]),
                               float(w1d(sx, sy)), rtol=1e-5)


def test_wasserstein_with_transform():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    wt = Wasserstein1DWithTransform(
        wasserstein=Wasserstein1D(p=2, square_dist=True), n_fft=512, hop_length=128)
    out = wt(x, y)
    assert np.isfinite(float(out))
    # manual: same transform + module
    sx = stft_magnitude(x, size=512, overlap=0.75)
    sy = stft_magnitude(y, size=512, overlap=0.75)
    freqs = rfft_frequencies(512, 16000)
    pos = jnp.asarray(freqs / freqs.max())
    ref = Wasserstein1D(p=2, square_dist=True)(sx, sy, x_pos=pos, y_pos=pos)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_wasserstein_grad_through_module():
    rng = np.random.default_rng(9)
    x, y = _spectra(rng, bins=65)
    pos = jnp.linspace(0, 1, 65)
    mine = Wasserstein1D(p=2, square_dist=True, dont_normalize=True,
                         limit_quantile_range=True)

    g = jax.grad(lambda y_: mine(jnp.asarray(x), y_, x_pos=pos, y_pos=pos))(
        jnp.asarray(y))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_same_grid_dispatch_rejects_unsorted_positions():
    """Non-monotone shared positions (log-scaled x_pos with a 0 Hz bin on a
    fine rfft grid) must fall back to the sorting general path."""
    import numpy as np
    import jax.numpy as jnp

    from sot_tpu.losses import Wasserstein1D

    rng = np.random.default_rng(0)
    n = 65
    pos_sorted = np.sort(rng.random(n)).astype(np.float32)
    pos_unsorted = pos_sorted.copy()
    pos_unsorted[0], pos_unsorted[1] = pos_unsorted[1], pos_unsorted[0]
    x = jnp.asarray(rng.random((6, n)).astype(np.float32))
    y = jnp.asarray(rng.random((6, n)).astype(np.float32))
    loss = Wasserstein1D(p=2)
    p_u = jnp.asarray(pos_unsorted)
    got = float(loss(x, y, x_pos=p_u, y_pos=p_u))
    # oracle: general path with explicit distinct position objects
    want = float(loss(x, y, x_pos=jnp.asarray(pos_unsorted),
                      y_pos=jnp.array(pos_unsorted)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hinge_threshold_from_call_kwarg():
    """self.hinge is a flag; the threshold is the call kwarg (default 0),
    reference losses.py:203-205."""
    import numpy as np
    import jax.numpy as jnp

    from sot_tpu.losses import Wasserstein1D

    rng = np.random.default_rng(1)
    n = 33
    pos = jnp.asarray(np.sort(rng.random(n)).astype(np.float32))
    x = jnp.asarray(rng.random((4, n)).astype(np.float32))
    y = jnp.asarray(rng.random((4, n)).astype(np.float32))
    base = float(Wasserstein1D(p=2)(x, y, x_pos=pos, y_pos=pos))
    flag_only = float(Wasserstein1D(p=2, hinge=True)(x, y, x_pos=pos, y_pos=pos))
    np.testing.assert_allclose(flag_only, base, rtol=1e-6)  # threshold 0
    big = float(Wasserstein1D(p=2, hinge=True)(x, y, x_pos=pos, y_pos=pos,
                                               hinge=1e9))
    assert big == 0.0
