"""Alpha (data/noise blend) and gamma (white/blue mix) schedules.

Re-implements, in pure JAX, the two scalar schedules of the reference
(`get_scheduler` at iadb_bn.py:90-143 and `get_scheduler_gamma` at
iadb_bn.py:147-201). Both map a timestep t in [0, T] to a value in [0, 1].

All functions are jittable and differentiable — in particular
``gamma_schedule`` is differentiable w.r.t. ``params`` so the (tau, s, e)
triple can be *learned* as in the reference's ``--optimize_scheduler_param``
mode (iadb_bn.py:847,960).
"""

from __future__ import annotations

import jax.numpy as jnp

_CLIP_MIN = 1e-9

ALPHA_KINDS = ("linear", "sigmoid", "cosine")
GAMMA_KINDS = ("linear", "sigmoid", "cosine")


def _sigmoid_warp(t, tau, start, end):
    """Normalized reversed sigmoid used by both schedules.

    Matches the reference math (iadb_bn.py:115-125 / 167-178): map the
    normalized time t in [0,1] through sigmoid((t*(e-s)+s)/tau), normalize
    to [0,1] between the endpoint values, clip, and flip. Implemented via
    sigmoid(a)-sigmoid(b) == (tanh(a/2)-tanh(b/2))/2 — mathematically
    identical, but avoids the fp32 catastrophic cancellation the naive form
    hits for large tau (all sigmoids ~0.5).
    """
    u = (t * (end - start) + start) / tau
    us = start / tau
    ue = end / tau
    num = jnp.tanh(ue / 2.0) - jnp.tanh(u / 2.0)
    den = jnp.tanh(ue / 2.0) - jnp.tanh(us / 2.0)
    out = jnp.clip(num / den, _CLIP_MIN, 1.0)
    return 1.0 - out


def _cosine_warp(t, tau, start, end):
    """Normalized cosine-power warp (iadb_bn.py:127-138 / 180-197)."""
    v_start = jnp.cos(start * jnp.pi / 2.0) ** (2.0 * tau)
    v_end = jnp.cos(end * jnp.pi / 2.0) ** (2.0 * tau)
    out = jnp.cos((t * (end - start) + start) * jnp.pi / 2.0) ** (2.0 * tau)
    out = (v_end - out) / (v_end - v_start)
    out = jnp.clip(out, _CLIP_MIN, 1.0)
    return 1.0 - out


def alpha_schedule(t, nb_steps, kind="linear", param=0.02):
    """alpha(t): blend factor between data and noise.

    Mirrors the reference ``get_scheduler`` (iadb_bn.py:90-143):
      - linear:  t / T                        (used by every published config)
      - sigmoid: fixed start=param, end=3, tau=0.9
      - cosine:  fixed start=0.2, end=1, tau=param
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    kind = kind.lower()
    if kind == "linear":
        return t / nb_steps
    if kind == "sigmoid":
        return _sigmoid_warp(t / nb_steps, 0.9, jnp.float32(param), jnp.float32(3.0))
    if kind == "cosine":
        return _cosine_warp(t / nb_steps, jnp.float32(param), jnp.float32(0.2), jnp.float32(1.0))
    raise NotImplementedError(f"unknown alpha schedule: {kind}")


def gamma_schedule(t, nb_steps, kind="linear", params=(1.0, 0.0, 3.0)):
    """gamma(t): white(1) <-> blue(0) mixing factor.

    Mirrors the reference ``get_scheduler_gamma`` (iadb_bn.py:147-201).
    ``params`` is the (tau, start, end) triple; it may be a traced jnp array
    so it can be optimized (reference iadb_bn.py:847). ``linear`` ignores
    params and returns t / T.
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    kind = kind.lower()
    if kind == "linear":
        return t / nb_steps
    params = jnp.asarray(params, dtype=jnp.float32)
    tau, start, end = params[0], params[1], params[2]
    if kind == "sigmoid":
        return _sigmoid_warp(t / nb_steps, tau, start, end)
    if kind == "cosine":
        return _cosine_warp(t / nb_steps, tau, start, end)
    raise NotImplementedError(f"unknown gamma schedule: {kind}")


def gamma_param_ranges(kind, optimize=False, defaults=(0.02, 0.0, 3.0)):
    """(min, max) clamp ranges for the learnable (tau, s, e) params.

    Mirrors the reference's per-schedule init/clamp ranges
    (iadb_bn.py:509-540, clamped after every optimizer step :993-995).
    Returns ((tau_min, tau_max), (s_min, s_max), (e_min, e_max)).
    """
    if not optimize:
        tau, s, e = defaults
        return ((tau, tau), (s, s), (e, e))
    kind = kind.lower()
    if kind == "sigmoid":
        return ((0.01, 10.0), (-3.0, -0.01), (0.01, 3.0))
    if kind == "linear":
        return ((1.0, 1.0), (1.0, 1.0), (1.0, 1.0))
    raise NotImplementedError(f"no learnable ranges for gamma schedule: {kind}")
