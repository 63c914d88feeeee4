"""Synthetic dataset generation: distribution, masking, splits, .pth shim."""

import numpy as np
import jax.numpy as jnp

from sot_tpu import data as D


def _small_dataset(**kw):
    defaults = dict(seed=0, size=60, n_samples=1024, n_fake_frames=4,
                    render_batch=30)
    defaults.update(kw)
    return D.generate_sinusoid_dataset(**defaults)


def test_generate_ranges_and_shapes():
    signals, freqs, amps = _small_dataset()
    assert signals.shape == (60, 1024)
    assert freqs.shape == (60, 1)       # harmonic: single f0
    assert amps.shape == (60, 8)
    assert (freqs >= 40).all() and (freqs <= 1950).all()
    active = amps > 0
    assert (amps[active] >= 0.4).all() and (amps[active] <= 1.0).all()


def test_first_harmonic_always_active_sequential_mask():
    _, _, amps = _small_dataset()
    assert (amps[:, 0] > 0).all()
    # sequential masking: active harmonics form a prefix
    active = amps > 0
    for row in active:
        k = row.sum()
        assert row[:k].all() and not row[k:].any()


def test_random_mask_variant():
    _, _, amps = _small_dataset(mask_rand_amplitudes=True)
    assert (amps[:, 0] > 0).all()
    n_active = (amps > 0).sum(1)
    assert n_active.min() >= 1 and n_active.max() <= 8
    # random masking: some row has a non-prefix active pattern
    active = amps > 0
    assert any(not row[: row.sum()].all() for row in active)


def test_mask_rand_amplitudes_exposed_in_config():
    """ExperimentConfig.mask_rand_amplitudes reaches the generator
    (reference synthetic_data.py:88-117 random masking mode)."""
    from sot_tpu.configs import get_experiment

    cfg = get_experiment("SOT-2048", dataset_size=60, n_samples=1024,
                         mask_rand_amplitudes=True)
    splits = D.dataset_from_config(cfg)
    amps = np.concatenate([splits[s].weights for s in ("train", "val", "test")])
    active = amps > 0
    assert (amps[:, 0] > 0).all()
    assert any(not row[: row.sum()].all() for row in active)
    # and the sequential default stays a prefix mask
    cfg_seq = get_experiment("SOT-2048", dataset_size=60, n_samples=1024)
    splits_seq = D.dataset_from_config(cfg_seq)
    amps_seq = np.concatenate(
        [splits_seq[s].weights for s in ("train", "val", "test")])
    for row in amps_seq > 0:
        k = row.sum()
        assert row[:k].all() and not row[k:].any()


def test_signals_are_harmonic():
    """Rendered signal's spectral peak sits at a harmonic of f0."""
    signals, freqs, amps = _small_dataset(size=8, n_samples=4096, render_batch=8)
    sr = 16000
    for i in range(8):
        spec = np.abs(np.fft.rfft(signals[i]))
        peak_hz = spec.argmax() * sr / 4096
        f0 = freqs[i, 0]
        ratio = peak_hz / f0
        assert abs(ratio - round(ratio)) < 0.15, (f0, peak_hz)


def test_split_sizes_and_disjointness():
    signals, freqs, amps = _small_dataset(size=100, render_batch=50)
    splits = D.random_split(signals, freqs, amps, eval_split=0.2, test_split=0.1)
    assert len(splits["train"]) == 70
    assert len(splits["val"]) == 20
    assert len(splits["test"]) == 10
    # disjoint: all signals unique, so check no row appears twice
    allx = np.concatenate([splits[k].x for k in ("train", "val", "test")])
    assert len(np.unique(allx[:, :16], axis=0)) == 100


def test_peak_normalize():
    x = np.array([[0.0, 2.0, -4.0]], np.float32)
    out = D.peak_normalize(x)
    np.testing.assert_allclose(out, [[0.0, 0.45, -0.9]], atol=1e-5)


def test_iterate_batches():
    signals, freqs, amps = _small_dataset()
    splits = D.random_split(signals, freqs, amps)
    batches = list(D.iterate_batches(splits["train"], batch_size=16))
    total = sum(len(b["x"]) for b in batches)
    assert total == len(splits["train"])
    b0 = batches[0]
    assert set(b0.keys()) == {"x", "frequency", "weights"}
    assert np.abs(b0["x"]).max() <= 0.9 + 1e-5


def test_pth_roundtrip(tmp_path):
    """Our .pth import shim reads the reference's save format."""
    import torch

    signals, freqs, amps = _small_dataset(size=20, render_batch=20)
    path = tmp_path / "ds.pth"
    save = {
        "train_tensors": torch.as_tensor(signals[:14]),
        "train_thetas": {"frequency": torch.as_tensor(freqs[:14]),
                         "weights": torch.as_tensor(amps[:14])},
        "val_tensors": torch.as_tensor(signals[14:18]),
        "val_thetas": {"frequency": torch.as_tensor(freqs[14:18]),
                       "weights": torch.as_tensor(amps[14:18])},
        "test_tensors": torch.as_tensor(signals[18:]),
        "test_thetas": {"frequency": torch.as_tensor(freqs[18:]),
                        "weights": torch.as_tensor(amps[18:])},
    }
    torch.save(save, path)
    loaded = D.load_pth_dataset(str(path))
    assert len(loaded["train"]) == 14
    assert len(loaded["test"]) == 2
    np.testing.assert_allclose(loaded["train"].x, signals[:14], atol=1e-6)
    np.testing.assert_allclose(loaded["val"].frequency, freqs[14:18], atol=1e-6)
