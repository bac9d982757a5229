"""Static-calibrated GroupNorm for the sampling path (serving experiment).

The r2 xplane profile pins the sampling step's largest cost on the
GroupNorm/SiLU elementwise passes (47% of device time bf16, ~30 ms/step
int8) — pure HBM bandwidth, which neither Pallas (slower streaming than XLA
fusions) nor more int8 can cut (BASELINE.md r2 analysis). What CAN cut it is
removing the *statistics* pass: dynamic GroupNorm reads x once to reduce
mean/var and again to normalize; with CALIBRATED per-(site, step) constants
the whole op collapses to one fused multiply-add that rides the neighboring
pass — the same static-scale trick that made int8 win (ops/int8.py).

Semantics change (unlike int8-static, which only rounds): GroupNorm is
per-sample, the calibrated constants are batch means recorded on one exact
trajectory — so this is fidelity-gated (SSIM/PSNR vs exact GN on identical
x0, scripts/bench_static_gn.py) exactly like the int8 path was.

Modes (mirroring ops/int8.Int8Conv):
  dynamic   — exact per-sample GroupNorm (parity path; the default)
  calibrate — exact GroupNorm, while recording batch-mean mean/var per scan
              step into (T, G) tables in the 'quant' collection
  static    — normalize with the calibrated constants for the current step:
              y = x * (scale * rstd[t]) + (bias - mean[t] * rstd[t] * scale)
  record    — exact GroupNorm, while storing THIS call's per-sample (B, G)
              mean/rstd into the mutable 'gnstats' collection
  reuse     — normalize with per-sample stats provided in the 'gnstats'
              collection (recorded by a previous 'record' forward)

record/reuse is the GN-stats-carry serving tier (r5): the static tables
above are batch means from ONE calibration trajectory, so they drop the
per-sample content dependence of GroupNorm — which is exactly why the
static tier fails on trained weights (TRAINED_GATES.json: 30.3 dB vs the
35 dB gate; trained activations vary per sample). The feature-reuse
(block-caching) sampler already alternates full/shallow forwards
(samplers/iadb.py::_cached_chain): running the group's full step in
'record' mode and the shallow steps in 'reuse' mode keeps the stats
per-sample and EXACT as of the group's full step, while still deleting the
stats-reduction pass from every shallow step — the same HBM win, without
the batch-mean approximation. The stats ride the cached trunk feature
through the scan ((B, G) fp32 per site — KBs next to the multi-GB shell
passes). Fidelity is gated like every tier (scripts/bench_trained_gates.py
STACK=gncarry).

Step indexing: the IADB sampler passes the continuous alpha = (t+1)/T as the
"timestep" (reference iadb_bn.py:319); with the linear alpha schedule (every
published run config) round(alpha * T) - 1 recovers t exactly, so the tables
are indexed without threading a separate step input through the model
(IADB calibrate/static therefore require linear alpha). DDIM's integer
timesteps carry no usable index, so its sampler threads the scan position
explicitly instead: ``sample_ddim(..., pass_step_idx=True)`` and
``calibrate_sampling_ddim`` both key the tables on trajectory position
(0 = highest-t step), overriding the alpha recovery via the model's
``step_idx`` argument.

Parameter tree is identical to ``nn.GroupNorm`` ('scale' + 'bias'), so
checkpoints and the converter are untouched.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _box_smooth(a, window):
    """Truncated box filter along axis 0 of a (T, G) table: each row becomes
    the mean of the rows within +-window//2, with the window clipped at the
    ends (so every output is a mean of real entries, no padding bias)."""
    if window <= 1:
        return a
    t = a.shape[0]
    c = np.cumsum(np.concatenate(
        [np.zeros((1,) + a.shape[1:], a.dtype), np.asarray(a)]), axis=0)
    half = window // 2
    lo = np.clip(np.arange(t) - half, 0, t)
    hi = np.clip(np.arange(t) + half + 1, 0, t)
    return ((c[hi] - c[lo]) / (hi - lo)[:, None]).astype(a.dtype)


def smooth_gn_tables(quant, window):
    """Neighbor-window smoothing of the calibrated per-(site, step) GroupNorm
    statistics (the 'gn_mean'/'gn_var' tables) along the step axis.

    Why: the static-GN tables are batch-mean statistics recorded on ONE
    calibration trajectory (ops/int8.py::calibrate_sampling*). For IADB's
    250 float-alpha steps they transfer; for DDIM's 1000-T integer-timestep
    trajectories the per-position estimates drift more (measured r4: the
    raw tables FAIL the DDIM fidelity gate at PSNR 32.5 dB — PARITY.md §6).
    Adjacent steps see nearly the same activation distribution, so a small
    moving average trades per-step calibration noise for a slight lag —
    the r5 rescue attempt (VERDICT r4 #4). Purely a host-side transform of
    the quant tree: table VALUES are runtime inputs, so the serving program
    does not retrace/recompile across windows.

    ``window <= 1`` returns the tree unchanged. int8 amax scalars and any
    other leaves are untouched.
    """
    if window <= 1:
        return quant

    def visit(path, leaf):
        name = getattr(path[-1], "key", None) if path else None
        if name in ("gn_mean", "gn_var") and np.ndim(leaf) == 2:
            return _box_smooth(np.asarray(leaf), window)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, quant)


def drift_correct_gnstats(gnstats, quant, idx_cur, idx_ref, epsilon=1e-5):
    """Drift-corrected GN-stats carry (r5): shift the per-sample statistics
    recorded at the cached group's full step (``idx_ref``) to the current
    shallow step (``idx_cur``) using the calibrated batch-mean tables.

    The plain carry tier reuses the full step's (B, G) mu/rstd unchanged, so
    its error is the activation drift across the group — measured on trained
    weights it fails the gate at interval 8 (SSIM 0.943, TRAINED_GATES.json
    stacks.gncarry). That drift has a large batch-common component: the IADB
    trajectory moves from noise to image, so every sample's activation scale
    shifts systematically with alpha. The calibrated per-(site, step) tables
    (ops/int8.py::calibrate_sampling with gn_mode='calibrate') measure
    exactly that batch-mean trajectory, so the first-order correction

        mu'   = mu_rec   + (gn_mean[t] - gn_mean[t_ref])       (additive)
        rstd' = rstd_rec * sqrt((gn_var[t_ref]+eps)/(gn_var[t]+eps))

    keeps the per-sample base (what makes the carry pass where static-GN
    fails) and removes the systematic drift (what makes the plain carry fail
    at useful intervals) — at zero extra HBM traffic: the correction is
    (B, G)-sized arithmetic on scan-carried stats against tiny (T, G)
    constant tables, nothing touches the activations.

    Pure function of pytrees: ``gnstats`` is the mutable collection returned
    by a gn_mode='record' forward; ``quant`` is the calibrated collection
    holding 'gn_mean'/'gn_var' tables at the SAME module paths (both are
    created inside CalGroupNorm). Sites present in gnstats but missing
    tables are passed through uncorrected. ``idx_cur``/``idx_ref`` are
    integer step indices (traced scalars are fine — table lookups are
    dynamic gathers on (T, G) arrays).
    """
    flat_q = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(quant)[0]:
        keys = tuple(getattr(k, "key", None) for k in path)
        if keys[-1] in ("gn_mean", "gn_var"):
            flat_q[keys] = leaf

    def visit(path, leaf):
        keys = tuple(getattr(k, "key", None) for k in path)
        if keys[-1] not in ("mu", "rstd"):
            return leaf
        mean_t = flat_q.get(keys[:-1] + ("gn_mean",))
        var_t = flat_q.get(keys[:-1] + ("gn_var",))
        if mean_t is None or var_t is None:
            return leaf  # no tables calibrated for this site
        t = jnp.clip(idx_cur, 0, mean_t.shape[0] - 1)
        r = jnp.clip(idx_ref, 0, mean_t.shape[0] - 1)
        if keys[-1] == "mu":
            return leaf + (mean_t[t] - mean_t[r])[None, :]
        return leaf * jnp.sqrt((var_t[r] + epsilon)
                               / (var_t[t] + epsilon))[None, :]

    return jax.tree_util.tree_map_with_path(visit, gnstats)


class CalGroupNorm(nn.Module):
    """GroupNorm with optional static-calibrated statistics (see module doc)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    mode: str = "dynamic"
    steps: int = 0  # calibration table length T (calibrate/static modes)

    @nn.compact
    def __call__(self, x, step_idx=None):
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if self.mode == "dynamic" or (self.mode in ("calibrate", "static")
                                      and self.is_initializing()):
            y = self._exact(x, scale, bias)
            if self.mode in ("calibrate", "static"):
                self._tables()  # init pass: just create the tables
            return y
        if self.mode == "record":
            # exact GN + store this call's per-sample stats for a later
            # 'reuse' forward (the cached sampler's shallow steps)
            mu, var = self._stats(x)  # (B, G) fp32
            rstd = jax.lax.rsqrt(var + self.epsilon)
            self.variable("gnstats", "mu", lambda: mu).value = mu
            self.variable("gnstats", "rstd", lambda: rstd).value = rstd
            return self._normalize(x, mu, rstd, scale, bias)
        if self.mode == "reuse":
            if self.is_initializing():
                return self._exact(x, scale, bias)
            if not (self.has_variable("gnstats", "mu")
                    and self.has_variable("gnstats", "rstd")):
                raise ValueError(
                    "CalGroupNorm(mode='reuse') needs the 'gnstats' "
                    "collection from a mode='record' forward in the "
                    "apply variables")
            mu = self.get_variable("gnstats", "mu")
            rstd = self.get_variable("gnstats", "rstd")
            return self._normalize(x, mu, rstd, scale, bias)
        if self.mode == "calibrate":
            if step_idx is None:
                raise ValueError("calibrate mode needs step_idx")
            mean_t, var_t = self._tables()
            mu, var = self._stats(x)
            # batch-mean constants for this (site, step)
            idx = jnp.clip(step_idx, 0, self.steps - 1)
            mean_t.value = mean_t.value.at[idx].set(jnp.mean(mu, axis=0))
            var_t.value = var_t.value.at[idx].set(jnp.mean(var, axis=0))
            return self._exact(x, scale, bias)
        if self.mode == "static":
            if step_idx is None:
                raise ValueError("static mode needs step_idx")
            mean_t, var_t = self._tables()
            idx = jnp.clip(step_idx, 0, self.steps - 1)
            mu = mean_t.value[idx]  # (G,)
            rstd = jax.lax.rsqrt(var_t.value[idx] + self.epsilon)  # (G,)
            # fold per-group constants into per-channel affine: one FMA pass
            mu_c = jnp.repeat(mu, c // g)
            rstd_c = jnp.repeat(rstd, c // g)
            w = (scale * rstd_c).astype(self.dtype)
            b = (bias - mu_c * rstd_c * scale).astype(self.dtype)
            return x.astype(self.dtype) * w + b
        raise ValueError(f"unknown CalGroupNorm mode {self.mode!r}")

    def _tables(self):
        if self.steps <= 0:
            raise ValueError("CalGroupNorm calibrate/static needs steps > 0")
        mean_t = self.variable("quant", "gn_mean",
                               lambda: jnp.zeros((self.steps, self.num_groups),
                                                 jnp.float32))
        var_t = self.variable("quant", "gn_var",
                              lambda: jnp.ones((self.steps, self.num_groups),
                                               jnp.float32))
        return mean_t, var_t

    def _stats(self, x):
        """Per-sample, per-group mean/var in fp32 (flax GroupNorm semantics:
        reduce over H, W and within-group channels)."""
        b, h, w, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, h, w, self.num_groups,
                                           c // self.num_groups)
        mu = jnp.mean(xf, axis=(1, 2, 4))
        var = jnp.mean(jnp.square(xf), axis=(1, 2, 4)) - jnp.square(mu)
        return mu, var  # (B, G) each

    def _normalize(self, x, mu, rstd, scale, bias):
        """One fused pass: per-sample (B, G) stats -> normalized output."""
        c = x.shape[-1]
        g = self.num_groups
        mu_c = jnp.repeat(mu, c // g, axis=1)[:, None, None, :]  # (B,1,1,C)
        rstd_c = jnp.repeat(rstd, c // g, axis=1)[:, None, None, :]
        y = (x.astype(jnp.float32) - mu_c) * rstd_c * scale + bias
        return y.astype(self.dtype)

    def _exact(self, x, scale, bias):
        mu, var = self._stats(x)  # (B, G)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        return self._normalize(x, mu, rstd, scale, bias)
