"""Torch/Lightning checkpoint -> flax params importer.

The reference releases Lightning checkpoints (reference eval_paper.py:22-51,
README) whose encoder weights correspond 1:1 to `models.encoder.PESTOEncoder`
(the layer mapping below is the same one validated end-to-end, gradients
included, by tests/test_e2e_parity.py). This module makes the published
artifacts loadable: `load_reference_state_dict` parses a checkpoint file,
`import_encoder_params` maps it onto a flax param tree, so `cli evaluate
--ckpt` workflows can reproduce the paper table from the released weights.

Layout mapping (torch -> flax):
  layernorm.{weight,bias} [1, bins]           -> LayerNorm_0.{scale,bias} [bins, 1]
  conv1.0 / prefilt_list.p.0 / conv2.0 /
    conv3.0 / conv4.0 / conv4.3 [out, in, k]  -> {conv1,prefilt p,conv2,conv3,
                                                  conv4a,conv4b}.Conv_0.kernel
                                                  [k, in, out] (transpose 2,1,0)
  linear.frequency.i.weight [1, 1, in+out-1]  -> frequency{i}.kernel [in+out-1]
      (reference ToeplitzLinear is a Conv1d = cross-correlation, so the tap
       vector maps WITHOUT a flip: both sides compute
       y[j] = sum_i x[i] w[i - j + out - 1])
  linear.{weights,gain}.0.{weight,bias}       -> {weights,gain}.Dense_0
      ([out, in] -> [in, out] transpose; flatten order matches because the
       flax encoder flattens channel-major like torch's NCW Flatten)

The decoder (Sinusoidal) is parameter-free on both sides; optimizer state is
not imported (evaluation-only restore, like the reference's eval_paper).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import numpy as np


def load_reference_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint file into {name: numpy array}.

    Accepts a Lightning .ckpt (dict with a 'state_dict' entry) or a bare
    torch state_dict save. Tensors are converted to numpy on CPU."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in sd.items()}


def _strip_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the LightningModule attribute prefix ('encoder.'; the reference
    Trainer holds the model at self.encoder, trainer.py:46)."""
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    return enc if enc else dict(sd)


def import_encoder_params(params: Any,
                          state_dict: Mapping[str, np.ndarray]) -> Any:
    """Return a copy of the flax variables ``params`` (as produced by
    ``PESTOEncoder.init``) with every weight replaced from the reference
    ``state_dict``. Raises KeyError on missing torch keys and ValueError on
    shape mismatches — a silent partial import would be worse than none."""
    sd = _strip_prefix(state_dict)
    p = jax.tree_util.tree_map(np.asarray, params)
    tree = {k: dict(v) if isinstance(v, Mapping) else v
            for k, v in p["params"].items()}

    def take(name: str, shape) -> np.ndarray:
        arr = np.asarray(sd[name], dtype=np.float32)
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: torch shape {arr.shape} != {shape}")
        return arr

    def conv(flax_name: str, torch_name: str):
        k = tree[flax_name]["Conv_0"]["kernel"]
        w = take(f"{torch_name}.weight", (k.shape[2], k.shape[1], k.shape[0]))
        tree[flax_name]["Conv_0"]["kernel"] = w.transpose(2, 1, 0)
        tree[flax_name]["Conv_0"]["bias"] = take(
            f"{torch_name}.bias", tree[flax_name]["Conv_0"]["bias"].shape)

    ln_scale = tree["LayerNorm_0"]["scale"]
    tree["LayerNorm_0"]["scale"] = take(
        "layernorm.weight", ln_scale.shape[::-1]).T
    tree["LayerNorm_0"]["bias"] = take(
        "layernorm.bias", ln_scale.shape[::-1]).T

    conv("conv1", "conv1.0")
    n_prefilt = sum(1 for name in tree if name.startswith("prefilt"))
    for i in range(n_prefilt):
        conv(f"prefilt{i}", f"prefilt_list.{i}.0")
    conv("conv2", "conv2.0")
    conv("conv3", "conv3.0")
    conv("conv4a", "conv4.0")
    conv("conv4b", "conv4.3")  # Sequential: Conv, act, Dropout, Conv

    for name in tree:
        if name.startswith("frequency"):
            i = int(name[len("frequency"):])
            n_w = tree[name]["kernel"].shape[0]
            tree[name]["kernel"] = take(
                f"linear.frequency.{i}.weight", (1, 1, n_w)).reshape(n_w)
    for head in ("weights", "gain"):
        if head in tree:
            k = tree[head]["Dense_0"]["kernel"]
            tree[head]["Dense_0"]["kernel"] = take(
                f"linear.{head}.0.weight", (k.shape[1], k.shape[0])).T
            tree[head]["Dense_0"]["bias"] = take(
                f"linear.{head}.0.bias", tree[head]["Dense_0"]["bias"].shape)

    out = dict(p)
    out["params"] = tree
    return jax.tree_util.tree_map(
        lambda a: jax.numpy.asarray(a, jax.numpy.float32), out)


def load_from_reference_ckpt(params: Any, path: str) -> Any:
    """One-call convenience: checkpoint file -> imported flax params."""
    return import_encoder_params(params, load_reference_state_dict(path))
