"""EMA of model weights, diffusers-EMAModel-compatible decay schedule.

The reference's DDIM/latent pipelines maintain an EMA copy
(ddim_diffusers.py:461-470, step :781-782; latent_...:379-388) with warmup:
decay(step) = min(max_decay, (1 - (1 + step/inv_gamma)^(-power))).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any
    step: jax.Array  # int32


def ema_init(params):
    # real copies, not jnp.asarray: the EMA tree must not alias the live
    # params — train steps donate the whole state, and donating the same
    # buffer twice fails partition 0 and deadlocks the gradient all-reduce
    # on the remaining partitions (XLA "donate the same buffer twice")
    return EmaState(params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
                    step=jnp.int32(0))


def ema_decay(step, max_decay=0.9999, inv_gamma=1.0, power=0.75, use_warmup=True, min_decay=0.0):
    if not use_warmup:
        return jnp.float32(max_decay)
    value = 1.0 - (1.0 + step.astype(jnp.float32) / inv_gamma) ** (-power)
    return jnp.clip(value, min_decay, max_decay)


def ema_update(state: EmaState, new_params, max_decay=0.9999, inv_gamma=1.0, power=0.75,
               use_warmup=True):
    step = state.step + 1
    d = ema_decay(step, max_decay, inv_gamma, power, use_warmup)
    ema = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, new_params)
    return EmaState(params=ema, step=step)
