"""Torch/Lightning checkpoint importer round-trip (VERDICT r3 task 8).

Builds the REFERENCE torch encoder (random torch init — i.e. weights the
flax side has never seen), saves it the way Lightning would ('encoder.'
attribute prefix, reference trainer.py:46), imports it with
`sot_tpu.models.import_torch`, and asserts the flax forward reproduces the
torch forward on a random batch. This is the direction eval_paper needs for
the released checkpoints (reference eval_paper.py:22-51) — the opposite
direction (flax -> torch) is already covered by tests/test_e2e_parity.py.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from sot_tpu.models.encoder import PESTOEncoder  # noqa: E402
from sot_tpu.models.import_torch import (import_encoder_params,  # noqa: E402
                                         load_from_reference_ckpt)
from tests._reference import import_reference  # noqa: E402


def _build_pair():
    ref_encoder = import_reference("encoder")
    tenc = ref_encoder.PESTOEncoder(
        n_bins_in=285, output_size=285, n_modes=20,
        output_splits=["frequency", "weights"], harmonic=True,
        n_chan_layers=[40, 30, 30, 10, 3], n_prefilt_layers=2,
        residual=True, kernel_size=15, activation_fn="leaky", a_lrelu=0.3,
        estimation_type="soft-argmax",
    )
    tenc.eval()
    enc = PESTOEncoder()
    params = enc.init(jax.random.key(0), jnp.zeros((2, 285)))
    return tenc, enc, params


def _lightning_style_state_dict(tenc):
    return {f"encoder.{k}": v.detach().cpu().numpy()
            for k, v in tenc.state_dict().items()}


def test_import_reproduces_torch_forward():
    tenc, enc, params = _build_pair()
    imported = import_encoder_params(params, _lightning_style_state_dict(tenc))

    rng = np.random.default_rng(5)
    x = rng.standard_normal((6, 285)).astype(np.float32) * 3.0
    with torch.no_grad():
        ref = tenc(torch.as_tensor(x))
    got = enc.apply(imported, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got["frequency"]),
                               ref["frequency"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["weights"]),
                               ref["weights"].numpy(), atol=2e-4)


def test_import_from_lightning_ckpt_file(tmp_path):
    tenc, enc, params = _build_pair()
    # Lightning checkpoint shape: {'state_dict': ..., extra metadata...}
    ckpt = {"state_dict": {f"encoder.{k}": v for k, v in
                           tenc.state_dict().items()},
            "epoch": 3, "global_step": 1234}
    path = tmp_path / "ref.ckpt"
    torch.save(ckpt, path)
    imported = load_from_reference_ckpt(params, str(path))

    x = np.random.default_rng(6).standard_normal((4, 285)).astype(np.float32)
    with torch.no_grad():
        ref = tenc(torch.as_tensor(x))
    got = enc.apply(imported, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got["frequency"]),
                               ref["frequency"].numpy(), atol=2e-4)


def test_import_rejects_shape_mismatch():
    tenc, _, params = _build_pair()
    sd = _lightning_style_state_dict(tenc)
    sd["encoder.conv1.0.weight"] = sd["encoder.conv1.0.weight"][:, :, :7]
    with pytest.raises(ValueError, match="conv1.0.weight"):
        import_encoder_params(params, sd)


def test_import_rejects_missing_key():
    tenc, _, params = _build_pair()
    sd = _lightning_style_state_dict(tenc)
    del sd["encoder.linear.weights.0.bias"]
    with pytest.raises(KeyError):
        import_encoder_params(params, sd)
