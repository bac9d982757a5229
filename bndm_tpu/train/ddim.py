"""DDPM/DDIM baseline training (the reference's comparison pipeline).

Rebuilds ddim_diffusers.py's train loop (:716-817): antithetic t in
[0, T-1], DDPM forward noising via the beta schedule, epsilon-MSE (or
SNR-weighted sample) loss, AdamW + HF LR schedule + grad-clip 1.0, EMA.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from bndm_tpu.samplers.ddim import DDIMScheduler
from bndm_tpu.train.ema import EmaState, ema_init, ema_update
from bndm_tpu.train.losses import antithetic_timesteps_ddim, ddim_loss


@dataclasses.dataclass(frozen=True)
class DDIMTrainConfig:
    ddpm_num_steps: int = 1000
    ddpm_beta_schedule: str = "linear"
    prediction_type: str = "epsilon"
    use_ema: bool = False
    ema_inv_gamma: float = 1.0
    ema_power: float = 0.75
    ema_max_decay: float = 0.9999


class DDIMTrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: Optional[EmaState]
    step: jax.Array


def make_ddim_train_step(apply_fn, cfg: DDIMTrainConfig, optimizer):
    scheduler = DDIMScheduler(
        num_train_timesteps=cfg.ddpm_num_steps,
        beta_schedule=cfg.ddpm_beta_schedule,
        prediction_type=cfg.prediction_type,
    )
    acp = scheduler.alphas_cumprod

    def loss_fn(params, clean, t, noise_key):
        noise = jax.random.normal(noise_key, clean.shape, clean.dtype)
        noisy = scheduler.add_noise(clean, noise, t)
        d = apply_fn(params, noisy, t.astype(jnp.float32))
        return ddim_loss(d, noise, clean, t, acp, cfg.prediction_type)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: DDIMTrainState, batch01, key):
        clean = batch01 * 2.0 - 1.0
        t_key, noise_key = jax.random.split(key)
        t = antithetic_timesteps_ddim(t_key, clean.shape[0], cfg.ddpm_num_steps)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, clean, t, noise_key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, cfg.ema_max_decay, cfg.ema_inv_gamma,
                         cfg.ema_power) if state.ema is not None else None
        return DDIMTrainState(params, opt_state, ema, state.step + 1), {"loss": loss}

    def init_state(params):
        return DDIMTrainState(
            params=params,
            opt_state=optimizer.init(params),
            ema=ema_init(params) if cfg.use_ema else None,
            step=jnp.int32(0),
        )

    train_step.loss_fn = loss_fn
    train_step.scheduler = scheduler
    return train_step, init_state
