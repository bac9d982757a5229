"""DDIM scheduler + sampler in JAX (the reference's comparison baseline).

Re-implements the subset of diffusers' ``DDIMScheduler`` the reference
exercises (ddim_diffusers.py:499 construction with num_train_timesteps +
beta_schedule + prediction_type; test loop :655-683 with eta=0 via
``scheduler.step(...).prev_sample``), with diffusers defaults:
beta_start=1e-4, beta_end=0.02, linear or squaredcos_cap_v2 betas,
clip_sample=True, set_alpha_to_one=True, steps_offset=0, "leading" timestep
spacing. The sampling loop is one jitted lax.scan.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end):
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float32)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float32)
            ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        def f(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1 - f((i + 1) / num_train_timesteps) / f(i / num_train_timesteps), 0.999)
            for i in range(num_train_timesteps)
        ]
        return np.asarray(betas, dtype=np.float32)
    raise NotImplementedError(beta_schedule)


class DDIMScheduler:
    def __init__(
        self,
        num_train_timesteps=1000,
        beta_start=1e-4,
        beta_end=0.02,
        beta_schedule="linear",
        prediction_type="epsilon",
        clip_sample=True,
        clip_sample_range=1.0,
        set_alpha_to_one=True,
        steps_offset=0,
        timestep_spacing="leading",
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.clip_sample = clip_sample
        self.clip_sample_range = clip_sample_range
        self.steps_offset = steps_offset
        self.timestep_spacing = timestep_spacing
        betas = _make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end)
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas))
        self.final_alpha_cumprod = jnp.asarray(
            1.0 if set_alpha_to_one else float(np.cumprod(alphas)[0])
        )
        self.num_inference_steps = None
        self.timesteps = None
        self.timesteps_np = None

    @classmethod
    def from_config(cls, config: dict):
        """Build from a diffusers ``scheduler_config.json`` dict (the tree the
        reference loads via DDIMScheduler.from_pretrained,
        ddim_diffusers.py:640); unknown keys are ignored like diffusers does."""
        import inspect

        keys = set(inspect.signature(cls.__init__).parameters) - {"self"}
        return cls(**{k: v for k, v in config.items() if k in keys})

    def set_timesteps(self, num_inference_steps):
        self.num_inference_steps = num_inference_steps
        if self.timestep_spacing == "leading":
            step_ratio = self.num_train_timesteps // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
            ts += self.steps_offset
        elif self.timestep_spacing == "trailing":
            step_ratio = self.num_train_timesteps / num_inference_steps
            ts = np.round(np.arange(self.num_train_timesteps, 0, -step_ratio)).astype(np.int64)
            ts -= 1
        else:
            raise NotImplementedError(self.timestep_spacing)
        # numpy kept separately: under jax>=0.9, jnp constants created inside
        # a jit trace are tracers, so static bookkeeping must stay numpy
        self.timesteps_np = ts
        self.timesteps = jnp.asarray(ts)
        return self.timesteps

    def _alpha_prod(self, t):
        """alphas_cumprod[t] with the final_alpha fallback for t < 0."""
        safe = jnp.clip(t, 0, self.num_train_timesteps - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe], self.final_alpha_cumprod)

    def step(self, model_output, timestep, sample, eta=0.0):
        """Deterministic DDIM step (eta=0, the reference's usage)."""
        assert eta == 0.0, "stochastic DDIM not used by the reference"
        t = jnp.asarray(timestep, jnp.int32)
        prev_t = t - self.num_train_timesteps // self.num_inference_steps
        alpha_prod_t = self._alpha_prod(t)
        alpha_prod_prev = self._alpha_prod(prev_t)
        beta_prod_t = 1.0 - alpha_prod_t

        if self.prediction_type == "epsilon":
            pred_x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
            pred_eps = model_output
        elif self.prediction_type == "sample":
            pred_x0 = model_output
            pred_eps = (sample - alpha_prod_t**0.5 * pred_x0) / beta_prod_t**0.5
        elif self.prediction_type == "v_prediction":
            pred_x0 = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            pred_eps = alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
        else:
            raise NotImplementedError(self.prediction_type)

        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -self.clip_sample_range, self.clip_sample_range)
            # diffusers recomputes eps from the clipped x0
            pred_eps = (sample - alpha_prod_t**0.5 * pred_x0) / beta_prod_t**0.5

        dir_xt = (1.0 - alpha_prod_prev) ** 0.5 * pred_eps
        prev_sample = alpha_prod_prev**0.5 * pred_x0 + dir_xt
        return prev_sample

    def add_noise(self, original_samples, noise, timesteps):
        """Forward process: sqrt(acp)*x0 + sqrt(1-acp)*eps (DDPM training)."""
        acp = self.alphas_cumprod[timesteps].reshape(-1, 1, 1, 1)
        return acp**0.5 * original_samples + (1.0 - acp) ** 0.5 * noise


@functools.partial(
    jax.jit, static_argnames=("apply_fn", "scheduler", "num_inference_steps",
                              "collect_frames", "pass_step_idx")
)
def sample_ddim(apply_fn, params, x0, *, scheduler, num_inference_steps,
                collect_frames=False, pass_step_idx=False):
    """DDIM reverse loop as one lax.scan. Returns (x, frames | None).

    Frames mirror the reference test loop (ddim_diffusers.py:667-685): x[0:1]
    is logged after the update whenever t % 100 == 0, plus the initial noise.

    ``pass_step_idx``: call ``apply_fn(params, x, t, step_idx=i)`` with the
    scan position i (0 = first/highest-t step) — the trajectory index the
    static-calibrated GroupNorm tables are keyed on for DDIM, whose integer
    timesteps (unlike IADB's alpha) don't encode their own position
    (ops/static_norm.py; calibrate with ops/int8.calibrate_sampling_ddim).
    """
    scheduler.set_timesteps(num_inference_steps)
    ts_np = scheduler.timesteps_np
    ts = jnp.asarray(ts_np)

    if collect_frames:
        frame_ts = [int(t) for t in ts_np if t % 100 == 0]
        n_frames = 1 + len(frame_ts)
        slot_of = {t: i + 1 for i, t in enumerate(frame_ts)}
        slots = jnp.asarray(
            [slot_of.get(int(t), -1) for t in ts_np], jnp.int32
        )
        frames0 = jnp.zeros((n_frames, 1) + x0.shape[1:], x0.dtype)
        frames0 = frames0.at[0].set(x0[0:1])
    else:
        frames0 = None
        slots = None

    def body(carry, inp):
        x, frames = carry
        t, i = inp
        tt = jnp.broadcast_to(t.astype(jnp.float32), (x.shape[0],))
        if pass_step_idx:
            d = apply_fn(params, x, tt, step_idx=i)
        else:
            d = apply_fn(params, x, tt)
        x = scheduler.step(d, t, x)
        if frames is not None:
            slot = slots[i]
            updated = jax.lax.dynamic_update_slice(
                frames, x[0:1][None].astype(frames.dtype), (jnp.maximum(slot, 0), 0, 0, 0, 0)
            )
            frames = jnp.where(slot >= 0, updated, frames)
        return (x, frames), None

    idx = jnp.arange(ts.shape[0])
    (x, frames), _ = jax.lax.scan(body, (x0, frames0), (ts, idx))
    return x, frames


@functools.partial(
    jax.jit, static_argnames=("apply_full", "apply_shallow", "scheduler",
                              "num_inference_steps", "cache_interval",
                              "pass_step_idx")
)
def sample_ddim_cached(apply_full, apply_shallow, params, x0, *, scheduler,
                       num_inference_steps, cache_interval,
                       pass_step_idx=False):
    """Feature-reuse (block-caching) DDIM sampler, cf. DeepCache
    (arXiv:2312.03209) — the DDIM counterpart of
    :func:`bndm_tpu.samplers.iadb.sample_iadb_cached`.

    Every ``cache_interval``-th step runs the full UNet and captures the
    trunk output (``apply_full(params, x, t[, step_idx]) -> (d, deep)``);
    the steps between recompute only the outer shell around the cached trunk
    (``apply_shallow(params, x, t, deep[, step_idx]) -> d``). The cache point
    and interval are static, so the alternation compiles into ONE lax.scan
    over macro groups (no lax.cond). The DDIM update itself is unchanged
    (``scheduler.step``), so this works for every prediction type.

    ``pass_step_idx``: thread the absolute scan position into the model —
    required when the static-calibrated GroupNorm tables are active (DDIM's
    integer timesteps carry no trajectory index, unlike IADB's alpha).
    Serving-only: no frame collection; fidelity must be gated like every
    serving tier (scripts/bench_deepcache.py DDIM leg).
    """
    if cache_interval < 2:
        raise ValueError(f"cache_interval {cache_interval} must be >= 2")
    scheduler.set_timesteps(num_inference_steps)
    ts_np = scheduler.timesteps_np
    n = len(ts_np)
    n_macro, rem = divmod(n, cache_interval)

    def call(fn, x, t, i, *extra):
        tt = jnp.broadcast_to(t.astype(jnp.float32), (x.shape[0],))
        if pass_step_idx:
            return fn(params, x, tt, *extra, step_idx=i)
        return fn(params, x, tt, *extra)

    def group(x, ts_g, idx_g, m):
        d, deep = call(apply_full, x, ts_g[0], idx_g[0])
        x = scheduler.step(d, ts_g[0], x)
        for j in range(1, m):  # static unroll: one compiled macro body
            d = call(apply_shallow, x, ts_g[j], idx_g[j], deep)
            x = scheduler.step(d, ts_g[j], x)
        return x

    if n_macro:
        ts_main = jnp.asarray(
            ts_np[: n_macro * cache_interval].reshape(n_macro, cache_interval))
        idx_main = jnp.arange(n_macro * cache_interval).reshape(
            n_macro, cache_interval)

        def body(x, inp):
            ts_g, idx_g = inp
            return group(x, ts_g, idx_g, cache_interval), None

        x0, _ = jax.lax.scan(body, x0, (ts_main, idx_main))
    if rem:  # trailing short group: fresh full forward, then shallow
        ts_r = jnp.asarray(ts_np[n_macro * cache_interval:])
        idx_r = jnp.arange(n_macro * cache_interval, n)
        x0 = group(x0, ts_r, idx_r, rem)
    return x0
