"""Fused Pallas CQT frame-slab kernel vs the XLA gather+matmul path.

The kernel (ops/pallas/cqt.py) must reproduce the XLA path bit-for-bit in
interpret mode (same bf16 window/bank operands, f32 accumulation) across
the supported shape envelope, and the SOT_TPU_CQT_PALLAS gate must fall
back to XLA for unsupported shapes.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sot_tpu.ops.cqt import _use_pallas_cqt, cqt_magnitude  # noqa: E402


def _tone_batch(batch, n_samples=4095, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / 16000.0
    f0 = rng.uniform(60, 600, size=(batch, 1))
    x = np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
    return (x * 0.9).astype(np.float32)


def _bf16_oracle(audio, bank, hop, n_frames, n_out):
    """Gather + matmul with the kernel's exact operand dtypes: bf16 windows
    and bank, f32 accumulation. (On TPU the XLA einsum path also runs bf16
    on the MXU; on CPU interpret runs it computes f32, so the dtype-matched
    oracle — not cqt_magnitude — is the bit-level comparison point.)"""
    width = bank.shape[0]
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(width)[None, :])
    total_need = (n_frames - 1) * hop + width
    audio = jnp.pad(audio, ((0, 0), (0, max(0, total_need - audio.shape[1]))))
    frames = jnp.asarray(audio, jnp.bfloat16)[:, idx]
    return jnp.einsum("bfw,wn->bfn", frames, jnp.asarray(bank, jnp.bfloat16),
                      preferred_element_type=jnp.float32)[..., :n_out]


@pytest.mark.parametrize("batch", [8, 16])
def test_pallas_cqt_project_matches_bf16_oracle(monkeypatch, batch):
    from sot_tpu.ops.cqt import build_cqt_kernels
    from sot_tpu.ops.pallas.cqt import cqt_project

    monkeypatch.setenv("SOT_TPU_PALLAS_INTERPRET", "1")
    x = jnp.asarray(_tone_batch(batch))
    k_real, k_imag, _, width, _ = build_cqt_kernels(16000, 32.7, 285, 36)
    bank = jnp.asarray(np.concatenate([k_real, k_imag], axis=1))
    pad = width // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    n_frames = (xp.shape[1] - width) // 256 + 1
    ref = _bf16_oracle(xp, bank, 256, n_frames, 570)
    got = cqt_project(xp, bank, 256, n_frames, 570)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref))) + 1e-12
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=1e-5)


def test_pallas_cqt_end_to_end_close_to_f32(monkeypatch):
    """Full cqt_magnitude through the gate vs the f32 XLA path: agreement
    within bf16 noise (the TPU einsum path is bf16 too, so this bounds the
    delta a training run would see)."""
    x = jnp.asarray(_tone_batch(8, seed=3))
    monkeypatch.delenv("SOT_TPU_CQT_PALLAS", raising=False)
    ref = cqt_magnitude(x, n_bins=285, hop_length=256)
    monkeypatch.setenv("SOT_TPU_CQT_PALLAS", "1")
    monkeypatch.setenv("SOT_TPU_PALLAS_INTERPRET", "1")
    got = cqt_magnitude(x, n_bins=285, hop_length=256)
    assert got.shape == ref.shape
    scale = float(jnp.max(ref)) + 1e-12
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=8e-3)


def test_gate_falls_back_on_unsupported_batch(monkeypatch):
    """batch not a multiple of 8 -> XLA path (results must still be right)."""
    monkeypatch.setenv("SOT_TPU_CQT_PALLAS", "1")
    monkeypatch.setenv("SOT_TPU_PALLAS_INTERPRET", "1")
    assert not _use_pallas_cqt(batch=5, kernel_width=32768, hop=256,
                               n_frames=16)
    x = jnp.asarray(_tone_batch(5, seed=1))
    out = cqt_magnitude(x, n_bins=285, hop_length=256)
    assert out.shape[0] == 5 and bool(jnp.all(jnp.isfinite(out)))


def test_gate_off_by_default(monkeypatch):
    monkeypatch.delenv("SOT_TPU_CQT_PALLAS", raising=False)
    assert not _use_pallas_cqt(batch=64, kernel_width=32768, hop=256,
                               n_frames=16)
