"""Production serving API: the validated fastest sampling configuration in
one call.

The serving tiers (each fidelity-gated on v5e, PARITY.md §6):
  bf16              16.45 samples/s/chip   (parity path)
  + int8-static     18.39  (SSIM 1.0 / PSNR 49 dB vs bf16)
  + static-GN       20.93  (SSIM 0.9996 / PSNR 40 dB vs exact-GN)
  + bf16 softmax    21.68-21.84  (same gate numbers — no added error)
  + cached(i=12)    39.20  (feature-reuse/DeepCache, the r4 ladder knee:
                            SSIM 1.000 / PSNR 50 dB vs uncached on
                            identical x0; ladder 28.7 (i=2) .. 40.8 (i=25,
                            43.8 dB) saturates at the 1.94x Amdahl ceiling
                            of the 0.515-cost shallow step)
  + microbatched    effective batch 1000+ in one program (no HBM ceiling)

``make_serving_sampler`` builds the calibrate/static model pair, runs the
one-off exact calibration trajectory (conv activation scales + per-step
GroupNorm statistics), and returns a closure that samples with the static
constants — full-batch, or scanning microbatches when ``microbatch`` is set.
The CLIs (--conv_int8/--static_gn/--microbatch) expose the same path; this
is the library surface.

The tier gates are WEIGHT-DEPENDENT: all of the numbers above were measured
on random-init weights, and the r5 trained-weight re-validation
(TRAINED_GATES.json) showed static-GN failing hard on a real checkpoint
(SSIM 0.9697 / 30.3 dB) while int8 + bf16-softmax + cached(i=8) passes at
31.8 samples/s (1.93x bf16). For deployment on weights you did not gate
yourself, use :func:`make_validated_serving_sampler` — it probes the ladder
and serves the fastest tier that passes on *your* weights.

Reference counterpart: the test branch of iadb_bn.py (:686-820) — eager
per-step torch with none of these tiers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def serving_model_pair(
    cfg,
    *,
    conv_int8: Optional[bool] = None,
    int8_static: bool = False,
    static_gn: bool = False,
    gn_steps: Optional[int] = None,
    relax_kw: Optional[dict] = None,
):
    """Build the (calibration, serving) UNet pair for the serving tiers.

    One place for the cal_kw/sta_kw assembly shared by the three CLIs and
    the ``make_serving_sampler*`` factories. ``conv_int8`` forces the flag
    into both configs (None leaves ``cfg.conv_int8`` as is — the CLIs set it
    at config-build time). ``relax_kw`` holds serving-only relaxations (e.g.
    ``attn_softmax_dtype``): calibration stays on the exact fp32 path,
    mirroring how conv/GN calibration runs exact math.

    Returns ``(m_cal, m_serve)`` — ``m_cal`` is None when no tier needs a
    calibration trajectory (then ``m_serve`` is just ``cfg`` + relaxations).
    """
    from bndm_tpu.models.unet2d import UNet2D

    cal_kw, sta_kw = {}, {}
    if conv_int8:
        cal_kw.update(conv_int8=True)
        sta_kw.update(conv_int8=True)
    if int8_static:
        cal_kw.update(int8_mode="calibrate")
        sta_kw.update(int8_mode="static")
    if static_gn:
        if gn_steps is None:
            raise ValueError("static_gn requires gn_steps")
        cal_kw.update(gn_mode="calibrate", gn_steps=gn_steps)
        sta_kw.update(gn_mode="static", gn_steps=gn_steps)
    if relax_kw:
        sta_kw.update(relax_kw)

    m_serve = UNet2D(dataclasses.replace(cfg, **sta_kw)) if sta_kw else UNet2D(cfg)
    needs_cal = int8_static or static_gn
    m_cal = UNet2D(dataclasses.replace(cfg, **cal_kw)) if needs_cal else None
    return m_cal, m_serve


def make_serving_sampler(
    cfg,
    params,
    nb_steps,
    *,
    conv_int8: bool = True,
    static_gn: bool = True,
    microbatch: Optional[int] = None,
    calib_batch: int = 8,
    key: Optional[jax.Array] = None,
    scheduler_alpha: str = "linear",
    alpha_param: float = 0.02,
    scheduler_gamma: str = "linear",
    gamma_params=(1.0, 0.0, 3.0),
    two_head: Optional[bool] = None,
    attn_softmax_dtype: Optional[str] = None,
    cache_interval: Optional[int] = None,
    x_c: Optional[jax.Array] = None,
    gn_carry=False,
):
    """Calibrate once, then serve.

    ``cfg``: a UNet2DConfig (any dtype); ``params``: its params (with or
    without the top-level {"params": ...} wrapper). Returns ``sample(x0)``
    -> denoised batch; when ``microbatch`` is set, x0's batch must divide by
    it and the buffer is donated (pass a fresh/copied array).

    ``static_gn`` requires the linear alpha schedule (ops/static_norm.py).
    ``attn_softmax_dtype``: optionally relax the attention softmax from the
    fp32 parity default (e.g. "bfloat16" removes the layout-changing fp32
    upcast fusions of the logits — 3 ms/step at the headline config, r3
    profile; fidelity-gated in scripts/bench_static_gn.py's ATTN_BF16 leg).
    ``cache_interval``: feature-reuse (block-caching) tier — every
    cache_interval-th step runs the full UNet, the steps between recompute
    only the outer ``cfg.cache_depth`` shell around the cached trunk output
    (samplers.iadb.sample_iadb_cached; fidelity-gated in
    scripts/bench_deepcache.py). Calibration always runs the full model.
    ``x_c``: channel-concat conditioning for the conditional super-res path
    (iadb_bn.py:406), batch-aligned with x0; calibration uses its leading
    slice. Not supported together with ``microbatch``.
    ``gn_carry``: GN-stats-carry tier (requires ``cache_interval`` > 1,
    mutually exclusive with ``static_gn``): the group's full forward runs
    exact GroupNorm while recording its per-sample (B, G) statistics; the
    shallow steps normalize with those carried stats instead of re-reducing
    — deletes the stats pass like static-GN, but keeps the per-sample
    content dependence that makes static tables fail on trained weights
    (ops/static_norm.py module doc; gated in
    scripts/bench_trained_gates.py STACK=gncarry). Values: False, True (or
    ``"carry"``) = plain carry; ``"drift"`` = drift-corrected carry — the
    carried per-sample stats are shifted to each shallow step with the
    calibrated batch-mean (T, G) tables
    (ops/static_norm.py::drift_correct_gnstats; removes the systematic
    alpha-dependent staleness that fails the plain carry at useful
    intervals on trained weights). ``"drift"`` calibrates the GN tables
    (so it requires the linear alpha schedule, like ``static_gn``) but
    serves with per-sample record/reuse GroupNorm, not static tables.
    """
    from bndm_tpu.ops.int8 import calibrate_sampling
    from bndm_tpu.samplers.iadb import (
        sample_iadb, sample_iadb_cached, sample_iadb_microbatched)

    if static_gn and scheduler_alpha != "linear":
        raise ValueError("static_gn requires the linear alpha schedule")
    if x_c is not None and microbatch:
        raise ValueError("x_c conditioning is not supported with microbatch "
                         "(the conditional workloads fit in one batch)")
    carry_mode = {False: None, True: "carry"}.get(gn_carry, gn_carry)
    if carry_mode not in (None, "carry", "drift"):
        raise ValueError(f"gn_carry must be False/True/'carry'/'drift', "
                         f"got {gn_carry!r}")
    if carry_mode and static_gn:
        raise ValueError("gn_carry and static_gn both replace GroupNorm — "
                         "pick one")
    if carry_mode and not (cache_interval is not None and cache_interval > 1):
        raise ValueError("gn_carry reuses stats across a cached group — it "
                         "requires cache_interval > 1")
    if carry_mode == "drift" and scheduler_alpha != "linear":
        raise ValueError("gn_carry='drift' indexes the calibrated GN tables "
                         "by step — it requires the linear alpha schedule")
    if two_head is None:
        two_head = cfg.out_channels == 2 * cfg.in_channels
    params = params.get("params", params)

    m_cal, model = serving_model_pair(
        cfg, conv_int8=True if conv_int8 else None, int8_static=conv_int8,
        # drift-corrected carry calibrates the batch-mean GN tables (for
        # the per-step correction), but serves record/reuse — the static
        # gn_mode set here is replaced below, never applied
        static_gn=static_gn or carry_mode == "drift", gn_steps=nb_steps,
        relax_kw={"attn_softmax_dtype": attn_softmax_dtype}
        if attn_softmax_dtype is not None else None)
    if m_cal is None:  # nothing to calibrate: plain jitted sampler
        p_serve = {"params": params}
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        # calibration needs input shapes -> lazily run on the first sample()
        p_serve = None

    gp = jnp.asarray(gamma_params, jnp.float32)

    def _calibrate(x_like):
        nonlocal p_serve
        x_cal = jax.random.normal(
            key, (min(calib_batch, x_like.shape[0]),) + x_like.shape[1:],
            jnp.float32)
        quant = calibrate_sampling(
            m_cal, params, x_cal, nb_steps,
            scheduler_alpha=scheduler_alpha, alpha_param=alpha_param,
            scheduler_gamma=scheduler_gamma, gamma_params=gp,
            two_head=two_head,
            x_c=None if x_c is None else x_c[:x_cal.shape[0]])
        p_serve = {"params": params, "quant": quant}

    caching = cache_interval is not None and cache_interval > 1

    if carry_mode:
        from bndm_tpu.models.unet2d import UNet2D
        from bndm_tpu.ops.static_norm import drift_correct_gnstats

        m_rec = UNet2D(dataclasses.replace(model.cfg, gn_mode="record"))
        m_reu = UNet2D(dataclasses.replace(model.cfg, gn_mode="reuse"))

        def step_of(t):
            # linear alpha: t carries alpha = (step+1)/T (samplers/iadb.py)
            return jnp.round(t[0] * nb_steps).astype(jnp.int32) - 1

        def apply_full(p, x, t):
            # full step: exact GN, capture trunk + per-sample GN stats; the
            # stats ride the opaque `deep` slot through the cached chain
            (d, deep), gv = m_rec.apply(p, x, t, return_deep=True,
                                        mutable=["gnstats"])
            stats = gv["gnstats"]
            pack = ((deep, stats) if carry_mode == "carry"
                    else (deep, stats, step_of(t)))
            return d, pack

        def apply_shallow(p, x, t, pack):
            if carry_mode == "carry":
                deep, stats = pack
            else:
                deep, stats, idx_ref = pack
                stats = drift_correct_gnstats(stats, p["quant"],
                                              step_of(t), idx_ref)
            return m_reu.apply(dict(p, gnstats=stats), x, t,
                               deep_feature=deep)
    else:
        def apply_full(p, x, t):
            return model.apply(p, x, t, return_deep=True)

        def apply_shallow(p, x, t, deep):
            return model.apply(p, x, t, deep_feature=deep)

    def sample(x0):
        """Denoise x0 (N, C, H, W) with the serving configuration."""
        if p_serve is None:
            _calibrate(x0)
        # Non-divisible batches must NOT silently fall back to the
        # full-batch sampler — that is the documented bs>=1000 HBM-OOM
        # path; let sample_iadb_microbatched raise its divisibility error.
        if microbatch and x0.shape[0] > microbatch:
            return sample_iadb_microbatched(
                apply_full if caching else model.apply, p_serve, x0,
                microbatch=microbatch,
                nb_steps=nb_steps, scheduler_alpha=scheduler_alpha,
                alpha_param=alpha_param, scheduler_gamma=scheduler_gamma,
                gamma_params=gp, two_head=two_head,
                apply_shallow_fn=apply_shallow if caching else None,
                cache_interval=cache_interval if caching else None)
        if caching:
            return sample_iadb_cached(
                apply_full, apply_shallow, p_serve, x0, nb_steps=nb_steps,
                cache_interval=cache_interval,
                scheduler_alpha=scheduler_alpha, alpha_param=alpha_param,
                scheduler_gamma=scheduler_gamma, gamma_params=gp,
                two_head=two_head, x_c=x_c)
        out, _ = sample_iadb(
            model.apply, p_serve, x0, nb_steps=nb_steps,
            scheduler_alpha=scheduler_alpha, alpha_param=alpha_param,
            scheduler_gamma=scheduler_gamma, gamma_params=gp,
            two_head=two_head, x_c=x_c)
        return out

    return sample


def make_serving_sampler_ddim(
    cfg,
    params,
    scheduler,
    num_inference_steps,
    *,
    conv_int8: bool = True,
    static_gn: bool = False,
    calib_batch: int = 8,
    key: Optional[jax.Array] = None,
    attn_softmax_dtype: Optional[str] = None,
    cache_interval: Optional[int] = None,
    gn_smooth_window: Optional[int] = None,
):
    """DDIM-baseline counterpart of :func:`make_serving_sampler`.

    Same calibrate-once-then-serve flow over a DDIM trajectory
    (ops/int8.py::calibrate_sampling_ddim). The static-GN tables are keyed
    on the sampler's scan position — DDIM's integer timesteps carry no
    index — so sampling runs with ``pass_step_idx`` (samplers/ddim.py).
    ``static_gn`` defaults OFF here, unlike the IADB sampler: measured on
    v5e (r4, PARITY.md §6) the static-GN tier FAILS the DDIM fidelity gate
    (SSIM 0.9986 / PSNR 32.5 dB < 35 — DDIM's 1000-T trajectories drift
    more per scan position than IADB's), while int8 + bf16-softmax passes
    at 40.3 dB. ``cache_interval``: feature-reuse (block-caching) tier via
    :func:`bndm_tpu.samplers.ddim.sample_ddim_cached` (calibration always
    runs the full model). ``gn_smooth_window``: with ``static_gn``, smooth
    the calibrated per-(site, step) GN tables with a truncated box filter of
    this width along the step axis (ops/static_norm.py::smooth_gn_tables —
    the r5 rescue for DDIM's per-position drift; gated in
    scripts/bench_ddim_gn_rescue.py). Returns ``sample(x0) -> batch``.
    """
    from bndm_tpu.ops.int8 import calibrate_sampling_ddim
    from bndm_tpu.ops.static_norm import smooth_gn_tables
    from bndm_tpu.samplers.ddim import sample_ddim, sample_ddim_cached

    params = params.get("params", params)
    m_cal, model = serving_model_pair(
        cfg, conv_int8=True if conv_int8 else None, int8_static=conv_int8,
        static_gn=static_gn, gn_steps=num_inference_steps,
        relax_kw={"attn_softmax_dtype": attn_softmax_dtype}
        if attn_softmax_dtype is not None else None)
    if m_cal is None:
        p_serve = {"params": params}
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        p_serve = None

    caching = cache_interval is not None and cache_interval > 1

    def apply_full(p, x, t, step_idx=None):
        return model.apply(p, x, t, step_idx=step_idx, return_deep=True)

    def apply_shallow(p, x, t, deep, step_idx=None):
        return model.apply(p, x, t, step_idx=step_idx, deep_feature=deep)

    def sample(x0):
        """Denoise x0 (N, C, H, W) with the DDIM serving configuration."""
        nonlocal p_serve
        if p_serve is None:
            x_cal = jax.random.normal(
                key, (min(calib_batch, x0.shape[0]),) + x0.shape[1:],
                jnp.float32)
            quant = calibrate_sampling_ddim(
                m_cal, params, x_cal, scheduler, num_inference_steps)
            if static_gn and gn_smooth_window:
                quant = smooth_gn_tables(quant, gn_smooth_window)
            p_serve = {"params": params, "quant": quant}
        if caching:
            return sample_ddim_cached(
                apply_full, apply_shallow, p_serve, x0, scheduler=scheduler,
                num_inference_steps=num_inference_steps,
                cache_interval=cache_interval, pass_step_idx=static_gn)
        out, _ = sample_ddim(
            model.apply, p_serve, x0, scheduler=scheduler,
            num_inference_steps=num_inference_steps,
            pass_step_idx=static_gn)
        return out

    return sample


def make_validated_serving_sampler(
    cfg,
    params,
    nb_steps,
    res,
    *,
    probe_batch: int = 8,
    gate_ssim: float = 0.99,
    gate_psnr_db: float = 35.0,
    cache_interval: int = 12,
    microbatch: Optional[int] = None,
    key: Optional[jax.Array] = None,
    verbose: bool = True,
    _candidates=None,
    **sched_kw,
):
    """Fidelity-validated serving: probe the tier ladder, serve the fastest
    tier that PASSES on *these* weights.

    Why this exists: the serving relaxations are weight-dependent. Every tier
    passes its gate on random-init weights (PARITY.md §6), but on the r5
    TRAINED 113M checkpoint the static-GN tier fails hard
    (TRAINED_GATES.json: full stack SSIM 0.9697 / PSNR 30.3 dB vs the 0.99/35
    gate — trained activations vary per-sample, so calibrated batch-mean GN
    statistics mis-normalize, the same structural failure the DDIM leg
    measured on random init). A fixed default is therefore wrong in one
    direction or the other; the production-safe API is calibrate → probe →
    fall back.

    The ladder, fastest-first (each probed end-to-end on ``probe_batch``
    samples against the bf16 parity path on identical x0):

      1. int8-static + static-GN + bf16-softmax + cached(``cache_interval``)
      2. int8-static + drift-corrected GN-stats-carry + bf16-softmax +
         cached(interval) (per-sample carried GN stats shifted per step by
         the calibrated batch-mean tables — built for exactly the
         trained-weight case where static tables fail)
      3. int8-static + plain GN-stats-carry + bf16-softmax + cached(interval)
      4. int8-static + bf16-softmax + cached(``cache_interval``)
      5. int8-static + bf16-softmax + cached(max(2, interval // 2))
      6. bf16 + cached(max(2, interval // 2))
      7. bf16 uncached — the parity path itself, never rejected

    ``res`` is the spatial size the probe (and serving) runs at — the UNet
    is resolution-agnostic, so the config does not carry it.
    Probing costs one bf16 reference run + one run per rejected tier at
    ``probe_batch`` (plus their compiles); serving then runs at the chosen
    tier. ``sched_kw`` is forwarded to :func:`make_serving_sampler`
    (scheduler_alpha/gamma, two_head, x_c, ...). Returns ``(sample,
    report)`` where report lists each probed tier with its SSIM/PSNR and
    the decision. Reference counterpart: none — the torch reference serves
    the exact eager path only (iadb_bn.py:686-820).
    """
    from bndm_tpu.utils.metrics import psnr, ssim

    if key is None:
        key = jax.random.PRNGKey(0)
    k_probe, k_cal = jax.random.split(key)
    half = max(2, cache_interval // 2)
    candidates = _candidates if _candidates is not None else [
        ("int8+staticGN+bf16sm+cached(i=%d)" % cache_interval,
         dict(conv_int8=True, static_gn=True, attn_softmax_dtype="bfloat16",
              cache_interval=cache_interval)),
        ("int8+gndrift+bf16sm+cached(i=%d)" % cache_interval,
         dict(conv_int8=True, static_gn=False, gn_carry="drift",
              attn_softmax_dtype="bfloat16", cache_interval=cache_interval)),
        ("int8+gncarry+bf16sm+cached(i=%d)" % cache_interval,
         dict(conv_int8=True, static_gn=False, gn_carry=True,
              attn_softmax_dtype="bfloat16", cache_interval=cache_interval)),
        ("int8+bf16sm+cached(i=%d)" % cache_interval,
         dict(conv_int8=True, static_gn=False,
              attn_softmax_dtype="bfloat16", cache_interval=cache_interval)),
        ("int8+bf16sm+cached(i=%d)" % half,
         dict(conv_int8=True, static_gn=False,
              attn_softmax_dtype="bfloat16", cache_interval=half)),
        ("bf16+cached(i=%d)" % half,
         dict(conv_int8=False, static_gn=False, cache_interval=half)),
    ]

    shape = (probe_batch, cfg.in_channels, res, res)
    x_probe = jax.random.normal(k_probe, shape, jnp.float32)

    def build(kw):
        return make_serving_sampler(
            cfg, params, nb_steps, key=k_cal, microbatch=microbatch,
            **kw, **sched_kw)

    sample_bf16 = build(dict(conv_int8=False, static_gn=False))
    ref = jnp.clip((sample_bf16(x_probe) + 1) / 2, 0, 1)

    report = []
    for name, kw in candidates:
        sample = build(kw)
        out = jnp.clip((sample(x_probe) + 1) / 2, 0, 1)
        s = float(jnp.mean(ssim(out, ref)))
        p = float(jnp.mean(psnr(out, ref)))
        ok = s >= gate_ssim and p >= gate_psnr_db
        report.append({"tier": name, "ssim": round(s, 4),
                       "psnr_db": round(p, 2),
                       "gate": "pass" if ok else "fail"})
        if verbose:
            print(f"serving probe {name}: SSIM {s:.4f} PSNR {p:.1f} dB "
                  f"{'PASS' if ok else 'fail'}", flush=True)
        if ok:
            report.append({"chosen": name})
            return sample, report
    report.append({"chosen": "bf16 parity path"})
    return sample_bf16, report
