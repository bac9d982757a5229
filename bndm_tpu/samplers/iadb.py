"""IADB/BNDM samplers as a single jitted lax.scan.

Rebuilds reference ``sample_iadb`` / ``sample_iadb_conditional``
(iadb_bn.py:286-379, 384-438) and the latent ``IADBScheduler``
(latent_...:75-142) TPU-first: the whole reverse Euler chain (e.g. 250
sequential UNet calls) compiles into ONE ``lax.scan`` inside one jit — no
per-step Python dispatch (SURVEY.md S3.2 "the benchmark path").

Update rule per step t = T-1 .. 0 (reference :311-344):
    a_s = alpha(t+1), a_e = alpha(t); g_s = gamma(t+1), g_e = gamma(t)
    d   = model(x, a_s)
    two-head BNDM (out = 2*C): x += (a_s - a_e) * d[:, :C] + (g_s - g_e) * d[:, C:]
    single-head / gaussian / GBN: x += (a_s - a_e) * d

Intermediate frames: the reference logs x[0:1] every ``log_freq`` steps
(100 if T==1000 else 25) plus at t = T-1, *after* the update (:364-373).
Frame steps are static, so they are written into a preallocated buffer
inside the scan — still one compiled program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from bndm_tpu.ops.schedules import alpha_schedule, gamma_schedule


def _frame_slots(nb_steps, log_freq):
    """slot[t] = frame index in scan (t descending) order, or -1."""
    steps = [t for t in reversed(range(nb_steps)) if t % log_freq == 0 or t == nb_steps - 1]
    slots = [-1] * nb_steps
    for i, t in enumerate(steps):
        slots[t] = i
    return slots, len(steps)


def iadb_step(x, d, a_s, a_e, g_s, g_e, *, two_head):
    """One reverse-Euler IADB update (shared by pixel and latent paths)."""
    if two_head:
        c = x.shape[1]
        return x + (a_s - a_e) * d[:, :c] + (g_s - g_e) * d[:, c:]
    return x + (a_s - a_e) * d


@functools.partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "nb_steps", "scheduler_alpha", "alpha_param",
        "scheduler_gamma", "two_head", "collect_frames", "log_freq",
    ),
)
def sample_iadb(
    apply_fn,
    params,
    x0,
    *,
    nb_steps,
    scheduler_alpha="linear",
    alpha_param=0.02,
    scheduler_gamma="linear",
    gamma_params=(1.0, 0.0, 3.0),
    two_head=False,
    x_c: Optional[jax.Array] = None,
    collect_frames=False,
    log_freq=None,
):
    """Deterministic reverse sampling. Returns (x, frames | None).

    ``apply_fn(params, x, t)``: the model; for the conditional super-res path
    pass ``x_c`` and the model sees ``concat([x, x_c], 1)``
    (reference iadb_bn.py:406). ``gamma_params`` may be a traced (3,) array
    (learned tau/s/e). ``frames`` are the reference's logged intermediates of
    sample 0, shape (n_frames, 1, C, H, W), in t-descending order.
    """
    gamma_params = jnp.asarray(gamma_params, jnp.float32)
    if log_freq is None:
        log_freq = 100 if nb_steps == 1000 else 25

    ts = jnp.arange(nb_steps - 1, -1, -1, dtype=jnp.float32)

    if collect_frames:
        slots, n_frames = _frame_slots(nb_steps, log_freq)
        slots = jnp.asarray(slots, jnp.int32)
        frames0 = jnp.zeros((n_frames, 1) + x0.shape[1:], x0.dtype)
    else:
        frames0 = None

    def alpha(t):
        return alpha_schedule(t, nb_steps, scheduler_alpha, alpha_param)

    def gamma(t):
        return gamma_schedule(t, nb_steps, scheduler_gamma, gamma_params)

    def body(carry, t):
        x, frames = carry
        a_s, a_e = alpha(t + 1.0), alpha(t)
        g_s, g_e = gamma(t + 1.0), gamma(t)
        tt = jnp.broadcast_to(a_s, (x.shape[0],))
        inp = x if x_c is None else jnp.concatenate([x, x_c], axis=1)
        d = apply_fn(params, inp, tt)
        x = iadb_step(x, d, a_s, a_e, g_s, g_e, two_head=two_head)
        if frames is not None:
            slot = slots[t.astype(jnp.int32)]
            updated = jax.lax.dynamic_update_slice(
                frames, x[0:1][None].astype(frames.dtype), (jnp.maximum(slot, 0), 0, 0, 0, 0)
            )
            frames = jnp.where(slot >= 0, updated, frames)
        return (x, frames), None

    (x, frames), _ = jax.lax.scan(body, (x0, frames0), ts)
    return x, frames


def _cached_chain(apply_full, apply_shallow, params, x, ts0, rem, *,
                  cache_interval, alpha, gamma, two_head, x_c=None,
                  carry_dtype=None):
    """The feature-reuse reverse chain: scan over macro groups of
    ``cache_interval`` steps — one full forward (which also returns the
    trunk output) then ``cache_interval - 1`` shallow forwards reusing it —
    plus a trailing short group for ``rem = nb_steps % cache_interval``.

    ``ts0``: (n_macro,) descending group-start timesteps;
    ``apply_full(params, x, t) -> (d, deep)``;
    ``apply_shallow(params, x, t, deep) -> d``.
    ``x_c``: optional channel-concat conditioning (super-res,
    iadb_bn.py:406) — the model sees ``concat([x, x_c], 1)`` on full AND
    shallow forwards (the conditioning enters through the recomputed shell;
    the cached trunk already saw it on the group's full step).
    ``carry_dtype``: keep the sample buffer in this dtype between steps
    (e.g. bf16 — halves the carry's HBM bytes in the bandwidth-bound shell
    glue fusion the r4 roofline audit flagged at ~4.7 ms/shallow step; the
    step arithmetic itself stays fp32, only the stored x is rounded).
    Fidelity-gated in scripts/bench_cached_carry.py; None = fp32 (default,
    trace-identical to r4).
    """
    out_dtype = x.dtype
    if carry_dtype is not None:
        x = x.astype(carry_dtype)

    def one_step(x, t, d):
        a_s, a_e = alpha(t + 1.0), alpha(t)
        g_s, g_e = gamma(t + 1.0), gamma(t)
        y = iadb_step(x, d, a_s, a_e, g_s, g_e, two_head=two_head)
        return y.astype(carry_dtype) if carry_dtype is not None else y

    def tt(x, t):
        return jnp.broadcast_to(alpha(t + 1.0), (x.shape[0],))

    def inp(x):
        return x if x_c is None else jnp.concatenate([x, x_c], axis=1)

    def group(x, t0, m):
        d, deep = apply_full(params, inp(x), tt(x, t0))
        x = one_step(x, t0, d)
        for j in range(1, m):  # static unroll: one compiled macro body
            t = t0 - j
            d = apply_shallow(params, inp(x), tt(x, t), deep)
            x = one_step(x, t, d)
        return x

    def body(x, t0):
        return group(x, t0, cache_interval), None

    x, _ = jax.lax.scan(body, x, ts0)
    if rem:  # final t = rem-1 .. 0 (fresh full forward, then shallow)
        x = group(x, jnp.float32(rem - 1), rem)
    return x.astype(out_dtype) if carry_dtype is not None else x


@functools.partial(
    jax.jit,
    static_argnames=(
        "apply_full", "apply_shallow", "nb_steps", "cache_interval",
        "scheduler_alpha", "alpha_param", "scheduler_gamma", "two_head",
        "carry_dtype",
    ),
)
def sample_iadb_cached(
    apply_full,
    apply_shallow,
    params,
    x0,
    *,
    nb_steps,
    cache_interval,
    scheduler_alpha="linear",
    alpha_param=0.02,
    scheduler_gamma="linear",
    gamma_params=(1.0, 0.0, 3.0),
    two_head=False,
    x_c: Optional[jax.Array] = None,
    carry_dtype=None,
):
    """Feature-reuse (block-caching) serving sampler, cf. "Cache Me if You
    Can" (arXiv:2312.03209) / DeepCache — TPU-first: the cache point and
    interval are static, so the full/shallow alternation compiles into ONE
    lax.scan over macro groups (no lax.cond, no per-step dispatch).

    Every ``cache_interval``-th step runs the full UNet and captures the
    trunk output (``apply_full(params, x, t) -> (d, deep)``, see
    UNet2D(return_deep=True)); the following ``cache_interval - 1`` steps
    recompute only the outer shell around the cached trunk
    (``apply_shallow(params, x, t, deep) -> d``, UNet2D(deep_feature=...)).
    ``cache_interval=1`` is exactly the plain sampler (tested). ``x_c``:
    channel-concat conditioning for the super-res path (iadb_bn.py:406),
    seen by every forward. Serving-only: no frame collection; fidelity must
    be gated like every serving tier (scripts/bench_deepcache.py).
    """
    gamma_params = jnp.asarray(gamma_params, jnp.float32)
    if cache_interval < 1:
        raise ValueError(f"cache_interval {cache_interval} must be >= 1")
    rem = nb_steps % cache_interval

    def alpha(t):
        return alpha_schedule(t, nb_steps, scheduler_alpha, alpha_param)

    def gamma(t):
        return gamma_schedule(t, nb_steps, scheduler_gamma, gamma_params)

    ts0 = jnp.arange(nb_steps - 1, rem - 1, -cache_interval, dtype=jnp.float32)
    return _cached_chain(
        apply_full, apply_shallow, params, x0, ts0, rem,
        cache_interval=cache_interval, alpha=alpha, gamma=gamma,
        two_head=two_head, x_c=x_c, carry_dtype=carry_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "microbatch", "nb_steps", "scheduler_alpha", "alpha_param",
        "scheduler_gamma", "two_head", "apply_shallow_fn", "cache_interval",
        "carry_dtype",
    ),
    donate_argnums=(2,),
)
def sample_iadb_microbatched(
    apply_fn,
    params,
    x0,
    *,
    microbatch,
    nb_steps,
    scheduler_alpha="linear",
    alpha_param=0.02,
    scheduler_gamma="linear",
    gamma_params=(1.0, 0.0, 3.0),
    two_head=False,
    apply_shallow_fn=None,
    cache_interval=None,
    carry_dtype=None,
):
    """Gallery-scale serving: one compiled program that denoises an effective
    batch of ``B = K * microbatch`` samples as a scan over K microbatches,
    each running the full ``nb_steps`` reverse chain.

    With ``cache_interval`` set, each microbatch's chain is the feature-reuse
    chain of :func:`sample_iadb_cached` (then ``apply_fn(params, x, t)`` must
    return ``(d, deep)`` and ``apply_shallow_fn(params, x, t, deep) -> d``).

    Why: the full-batch sampler's activation watermark grows with B, and the
    v5e worker OOMs at B=1000 for the 113M res-64 UNet (the reference's
    gallery workload is total_num=30000, scripts/sampling/cat_res64_test.sh:5,
    iadb_bn.py:719-728). Scanning over microbatches holds only ONE
    microbatch's UNet activations at any time — the carry is just the
    (K, mb, C, H, W) sample buffer, donated, updated in place — so effective
    batches of 1000-2000+ run in one dispatch with the per-step fixed costs
    of the validated mb=500 configuration.

    x0 may be (B, C, H, W) with B divisible by ``microbatch``, or already
    (K, mb, C, H, W). Returns samples with the same leading layout as given.
    Frames are not collected (gallery mode saves final samples only).
    """
    gamma_params = jnp.asarray(gamma_params, jnp.float32)
    squeeze = x0.ndim == 4
    if squeeze:
        b = x0.shape[0]
        if b % microbatch:
            raise ValueError(f"batch {b} not divisible by microbatch {microbatch}")
        x0 = x0.reshape((b // microbatch, microbatch) + x0.shape[1:])

    ts = jnp.arange(nb_steps - 1, -1, -1, dtype=jnp.float32)

    def alpha(t):
        return alpha_schedule(t, nb_steps, scheduler_alpha, alpha_param)

    def gamma(t):
        return gamma_schedule(t, nb_steps, scheduler_gamma, gamma_params)

    def denoise_one(x, _):
        if cache_interval:
            rem = nb_steps % cache_interval
            ts0 = jnp.arange(nb_steps - 1, rem - 1, -cache_interval,
                             dtype=jnp.float32)
            return _cached_chain(
                apply_fn, apply_shallow_fn, params, x, ts0, rem,
                cache_interval=cache_interval, alpha=alpha, gamma=gamma,
                two_head=two_head, carry_dtype=carry_dtype), None

        def body(x, t):
            a_s, a_e = alpha(t + 1.0), alpha(t)
            g_s, g_e = gamma(t + 1.0), gamma(t)
            tt = jnp.broadcast_to(a_s, (x.shape[0],))
            d = apply_fn(params, x, tt)
            return iadb_step(x, d, a_s, a_e, g_s, g_e, two_head=two_head), None

        x, _ = jax.lax.scan(body, x, ts)
        return x, None

    # scan-over-microbatches with the buffer as donated carry: lax.scan over
    # the leading axis would stack outputs into a fresh buffer; carrying the
    # whole (K, mb, ...) array and updating slice k in place lets XLA alias
    # input and output (zero extra HBM beyond one microbatch's activations)
    def outer(buf, k):
        xk = jax.lax.dynamic_index_in_dim(buf, k, axis=0, keepdims=False)
        xk, _ = denoise_one(xk, None)
        buf = jax.lax.dynamic_update_index_in_dim(buf, xk, k, axis=0)
        return buf, None

    buf, _ = jax.lax.scan(outer, x0, jnp.arange(x0.shape[0]))
    return buf.reshape((-1,) + buf.shape[2:]) if squeeze else buf


class IADBScheduler:
    """diffusers-style scheduler facade (latent pipeline API parity).

    Mirrors reference ``IADBScheduler`` (latent_...:75-142): linear
    alpha = gamma = t / num_inference_steps, two-head step when the model
    predicts 2*C channels, and the forward blend
    ``add_noise = (1-alpha)*clean + alpha*noise`` (:127-138).
    """

    def __init__(self, num_train_timesteps: int = 1000):
        self.num_train_timesteps = num_train_timesteps
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps: int):
        self.num_inference_steps = num_inference_steps

    @property
    def timesteps(self):
        return list(reversed(range(self.num_inference_steps)))

    def step(self, model_output, timestep, x_alpha, *, two_head=False):
        if self.num_inference_steps is None:
            raise ValueError("call set_timesteps first")
        n = self.num_inference_steps
        a = (timestep + 1) / n
        a_next = timestep / n
        return iadb_step(x_alpha, model_output, a, a_next, a, a_next, two_head=two_head)

    def add_noise(self, original_samples, noise, alpha):
        a = jnp.reshape(alpha, (-1, 1, 1, 1))
        return (1.0 - a) * original_samples + a * noise

    def __len__(self):
        return self.num_train_timesteps
