"""Multi-chip training step: batch data-parallelism over the mesh.

The per-chip compute is exactly the single-chip ``train_step``; here we
express its distribution once with sharding annotations and let XLA's SPMD
partitioner insert the gradient psum over ICI/DCN. With a 46K-param encoder
and a frozen decoder, gradients are tiny (~184 KB) — DP scales essentially
linearly as long as the per-chip batch keeps the MXU busy.

Frame-sharded STFT / frequency-sharded SOT variants (explicit shard_map +
collectives) live in sot_tpu.parallel.sharded_ops and are exercised by the
multichip dryrun.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sot_tpu.features import STFT
from sot_tpu.losses import Wasserstein1D
from sot_tpu.training.trainer import (Modules, TrainState, compute_loss,
                                      make_optimizer, prior_scale_at,
                                      temperature_at)

import optax


@dataclasses.dataclass(frozen=True)
class _FrameShardedSTFT:
    """Drop-in for features.STFT whose frames ride the mesh 'freq' axis.

    Same output as the single-device transform (halo-exchange framing via
    ppermute, see sharded_ops); the batch dimension stays on 'data' so the
    op lives inside the DP train step.
    """

    inner: STFT
    mesh: Mesh

    def __call__(self, audio, reduce: bool = False, log: bool = False):
        from sot_tpu.parallel.sharded_ops import stft_magnitude_frame_sharded

        x = stft_magnitude_frame_sharded(
            audio, self.mesh, size=self.inner.n_fft,
            hop_length=self.inner.hop_length, window=self.inner.window,
            axis="freq", batch_axis="data")
        if reduce:
            x = x.mean(axis=1)
        if log or self.inner.log:
            from sot_tpu.ops.numerics import safe_log

            x = safe_log(x)
        return x

    def get_frequencies(self):
        return self.inner.get_frequencies()


def shard_loss_modules(mod: Modules, mesh: Mesh) -> Modules:
    """Rebind the loss path onto the mesh: frame-sharded loss-domain STFT +
    row-sharded same-grid SOT solve (rows = batch x frames ride both mesh
    axes; each device solves its block with zero collectives).

    Only applies to STFT-domain configs with a sorted (linear) grid — the
    same condition under which the single-chip fused kernel dispatches.
    """
    from sot_tpu.parallel.sharded_ops import wasserstein_same_grid_row_sharded

    if not isinstance(mod.transform, STFT):
        return mod
    new_losses = []
    for kind, fn, weight in mod.loss_fns:
        if kind == "wasserstein" and isinstance(fn, Wasserstein1D):
            def solver(grid, u, v, _fn=fn):
                return wasserstein_same_grid_row_sharded(
                    grid, u, v, mesh, p=_fn.p,
                    limit_quantile_range=_fn.limit_quantile_range,
                    target_constant=_fn.target_constant)

            fn = dataclasses.replace(fn, solver=solver)
        new_losses.append((kind, fn, weight))
    return dataclasses.replace(
        mod, transform=_FrameShardedSTFT(mod.transform, mesh),
        loss_fns=tuple(new_losses))


def make_sharded_train_step(mod: Modules, mesh: Mesh,
                            shard_loss: Optional[bool] = None) -> Callable:
    """jit-compiled DP train step: params replicated, batch sharded on 'data'.

    With ``shard_loss`` (default: whenever the mesh has a non-trivial 'freq'
    axis and the loss domain is an STFT), the loss path additionally runs
    frame-sharded STFT + row-sharded SOT over the 'freq' axis — the mesh's
    second axis does real work inside the training step instead of only
    in detached demos.
    """
    if shard_loss is None:
        shard_loss = mesh.shape.get("freq", 1) > 1 and isinstance(
            mod.transform, STFT)
    if shard_loss:
        mod = shard_loss_modules(mod, mesh)
    opt = make_optimizer(mod.config)
    repl = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))

    def train_step(state: TrainState, x, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        temp = temperature_at(mod.config, state.step)
        pscale = prior_scale_at(mod.config, state.step)

        def loss_fn(params):
            loss, (logs, _) = compute_loss(mod, params, x, train=True,
                                           dropout_rng=dropout_rng,
                                           temperature=temp,
                                           prior_scale=pscale)
            return loss, logs

        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        logs["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), logs

    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sharded, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
