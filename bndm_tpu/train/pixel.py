"""Pixel-space IADB/BNDM training (the reference's main workload).

Rebuilds the iadb_bn.py train loop (:826-1028) TPU-first: one jitted train
step containing timestep sampling, the noise engine, (optional) batch-OT
remap, the UNet forward/backward, BOTH optimizers (model AdamW + scheduler-
param AdamW with post-step clamping — reference :840-847, :978-995), all
under data-parallel sharding on a Mesh.

Two-optimizer detail: the reference backprops one loss into the model AND
the learnable (tau, s, e) gamma parameters — gradients flow into the
schedule both through the loss weights and through the noise mix
(get_noise_v2 consumes gamma_t). jax.grad over both argnums reproduces that
exactly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from bndm_tpu.ops.noise import get_noise
from bndm_tpu.ops.schedules import alpha_schedule, gamma_schedule, gamma_param_ranges
from bndm_tpu.train.losses import antithetic_timesteps, bndm_loss, iadb_loss, remap_batch
from bndm_tpu.utils.image import superres_condition


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the iadb_bn.py argparse surface (flags :29-69)."""

    nb_steps: int = 1000
    noise_type: str = "gaussianBN"
    scheduler_alpha: str = "linear"
    alpha_param: float = 0.02
    scheduler_gamma: str = "sigmoid"
    gamma_defaults: Tuple[float, float, float] = (0.02, 0.0, 3.0)
    optimize_scheduler_param: bool = False
    out_channel: int = 6
    data_channels: int = 3
    lr: float = 1e-4
    sched_lr: float = 1e-3  # reference iadb_bn.py:847
    optimizer_type: str = "adamw"
    grad_clip: Optional[float] = None
    remap: bool = False
    conditional: bool = False  # superres: concat conditioning (in_channels 6)
    # "auto": the fused TPU Pallas RNG+matmul+mix kernel where eligible
    # (res-64 fresh noise on a TPU backend; ops/noise.py), xla elsewhere.
    # Measured train win on v5e: 1111 vs 1049 imgs/s at bs=64 (1.059x),
    # 1269 vs 1259 at bs=256 (scripts/bench_fused_noise_train.py, r4).
    # "xla" keeps the cross-backend-reproducible jax.random.normal stream.
    noise_engine: str = "auto"
    remat: bool = False  # jax.checkpoint the UNet: trade FLOPs for HBM

    @property
    def two_head(self):
        return (
            self.noise_type in ("gaussianBN", "gaussianRN")
            and self.out_channel == 2 * self.data_channels
        )


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    sched_params: jax.Array  # (3,) = (tau, s, e)
    sched_opt_state: Any
    step: jax.Array


def _make_optimizer(cfg: TrainConfig):
    opt = {"adam": optax.adam, "adamw": optax.adamw}[cfg.optimizer_type](cfg.lr)
    if cfg.grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def init_sched_params(key, cfg: TrainConfig):
    """Random init inside the per-schedule ranges (iadb_bn.py:537-540)."""
    ranges = gamma_param_ranges(cfg.scheduler_gamma, cfg.optimize_scheduler_param,
                                cfg.gamma_defaults)
    u = jax.random.uniform(key, (3,))
    lo = jnp.array([r[0] for r in ranges])
    hi = jnp.array([r[1] for r in ranges])
    return lo + (hi - lo) * u


def make_train_step(apply_fn, cfg: TrainConfig, L):
    """Build the jitted train step: (state, batch01, key) -> (state, metrics).

    ``batch01``: images in [0, 1] (the loader's output); the reference's
    ``x1 = data*2 - 1`` happens here (iadb_bn.py:861). ``apply_fn(params, x, t)``.
    """
    model_opt = _make_optimizer(cfg)
    sched_opt = optax.adamw(cfg.sched_lr)
    ranges = gamma_param_ranges(cfg.scheduler_gamma, cfg.optimize_scheduler_param,
                                cfg.gamma_defaults)
    clamp_lo = jnp.array([r[0] for r in ranges], jnp.float32)
    clamp_hi = jnp.array([r[1] for r in ranges], jnp.float32)
    correlated = cfg.noise_type in ("gaussianBN", "gaussianRN", "GBN")
    if cfg.remat:
        # rematerialize UNet activations on the backward pass — standard TPU
        # HBM/FLOP trade for bigger per-chip batches
        apply_fn = jax.checkpoint(apply_fn)

    def loss_fn(params, sched_params, x1, t, noise_key):
        alpha = alpha_schedule(t, cfg.nb_steps, cfg.scheduler_alpha, cfg.alpha_param)
        gamma = gamma_schedule(t, cfg.nb_steps, cfg.scheduler_gamma, sched_params)
        r = get_noise(x1, L, gamma, noise_type=cfg.noise_type, train=True,
                      inplace=False, key=noise_key, engine=cfg.noise_engine)
        x0 = r.noise
        if cfg.remap:
            mapping = remap_batch(x0, x1)
            x1_paired = x1[mapping]
        else:
            x1_paired = x1
        a = alpha.reshape(-1, 1, 1, 1)
        x_alpha = a * x0 + (1.0 - a) * x1_paired  # x1 = data, x0 = noise (:915)
        if cfg.conditional:
            x_c = superres_condition(x1_paired)
            inp = jnp.concatenate([x_alpha, x_c], axis=1)
        else:
            inp = x_alpha
        d = apply_fn(params, inp, alpha)
        alpha_prev = alpha_schedule(t - 1.0, cfg.nb_steps, cfg.scheduler_alpha, cfg.alpha_param)
        gamma_prev = gamma_schedule(t - 1.0, cfg.nb_steps, cfg.scheduler_gamma, sched_params)
        if correlated and cfg.noise_type != "GBN":
            loss = bndm_loss(d, x1_paired, x0, r.noise_bn, r.noise_wn,
                             alpha, alpha_prev, gamma, gamma_prev, cfg.two_head)
        else:
            loss = iadb_loss(d, x1_paired, x0)
        return loss, {"loss": loss}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch01, key):
        x1 = batch01 * 2.0 - 1.0
        t_key, noise_key = jax.random.split(key)
        t = antithetic_timesteps(t_key, x1.shape[0], cfg.nb_steps).astype(jnp.float32)
        (loss, metrics), (g_model, g_sched) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, state.sched_params, x1, t, noise_key)
        updates, opt_state = model_opt.update(g_model, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        s_updates, sched_opt_state = sched_opt.update(
            g_sched, state.sched_opt_state, state.sched_params
        )
        sched_params = optax.apply_updates(state.sched_params, s_updates)
        sched_params = jnp.clip(sched_params, clamp_lo, clamp_hi)  # (:993-995)
        metrics = dict(metrics, sched_tau=sched_params[0], sched_s=sched_params[1],
                       sched_e=sched_params[2])
        return TrainState(params, opt_state, sched_params, sched_opt_state,
                          state.step + 1), metrics

    def init_state(params, key):
        sched_params = init_sched_params(key, cfg)
        return TrainState(
            params=params,
            opt_state=model_opt.init(params),
            sched_params=sched_params,
            sched_opt_state=sched_opt.init(sched_params),
            step=jnp.int32(0),
        )

    # exposed for tests (e.g. sharded-vs-unsharded gradient parity)
    train_step.loss_fn = loss_fn
    return train_step, init_state


class PixelTrainer:
    """Convenience wrapper: model + config + L-matrix -> stateful trainer."""

    def __init__(self, model, cfg: TrainConfig, L, key, params=None):
        self.model = model
        self.cfg = cfg
        self.L = jnp.asarray(L)
        apply_fn = functools.partial(model.apply)
        self.train_step, self._init_state = make_train_step(apply_fn, cfg, self.L)
        k_param, k_sched = jax.random.split(key)
        if params is None:
            in_ch = cfg.data_channels * (2 if cfg.conditional else 1)
            dummy = jnp.zeros((1, in_ch, 64, 64), jnp.float32)
            params = model.init(k_param, dummy, jnp.zeros((1,), jnp.float32))
        self.state = self._init_state(params, k_sched)

    def step(self, batch01, key):
        self.state, metrics = self.train_step(self.state, batch01, key)
        return metrics
