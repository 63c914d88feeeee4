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

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sot_tpu.training.trainer import (Modules, TrainState, compute_loss,
                                      make_optimizer, prior_scale_at,
                                      temperature_at)

import optax


def make_sharded_train_step(mod: Modules, mesh: Mesh) -> Callable:
    """jit-compiled DP train step: params replicated, batch sharded on 'data'."""
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
