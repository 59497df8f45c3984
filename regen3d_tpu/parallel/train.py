"""Sharded training step for the flow-matching shape DiT.

The reference never trains (inference-only pipeline); this exists because a
production framework must fine-tune its asset generator, and because it
exercises the full dp×tp sharding path (driver dryrun contract).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from regen3d_tpu.models.dit import DiTConfig, ShapeDiT, flow_matching_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay)


def init_state(model: ShapeDiT, key: jax.Array, optimizer) -> TrainState:
    c = model.cfg
    x = jnp.zeros((1, c.latent_tokens, c.latent_dim))
    t = jnp.zeros((1,))
    cond = jnp.zeros((1, 16, c.cond_dim))
    params = model.init(key, x, t, cond)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def train_step(
    model: ShapeDiT,
    optimizer,
    state: TrainState,
    key: jax.Array,
    x0: jnp.ndarray,
    cond: jnp.ndarray,
) -> Tuple[TrainState, jnp.ndarray]:
    """One flow-matching step: grad + adamw update. Pure; jit outside."""

    def loss_fn(p):
        return flow_matching_loss(model, p, key, x0, cond)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), loss


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch rides the 'dp' axis; features replicated (then resharded by
    GSPMD inside the model per the param layout)."""
    return NamedSharding(mesh, P("dp"))
