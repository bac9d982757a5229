"""Capture + parse an xplane trace of the headline sampling program.

Profiles the cached bs=500 x 250-step IADB-BN scan on the real chip, then
aggregates per-op device time from the xplane.pb so the non-MXU fraction of
the 121 ms step can be attacked (VERDICT r1 weak #1/#6: 73% MFU -> target
>80%).

Usage: python scripts/profile_sampling.py [outdir]
Parsing notes (CLAUDE.md): tensorflow.tsl protobufs with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python; the while op's duration
contains its body's events — report it separately, don't sum it with leaves.
"""

import collections
import glob
import json
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402


def run_and_trace(outdir, batch=500, steps=250, res=64):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.samplers.iadb import sample_iadb

    _setup_compile_cache()
    int8 = os.environ.get("PROFILE_INT8") == "1"
    static_gn = os.environ.get("PROFILE_STATIC_GN") == "1"  # implies int8
    int8 = int8 or static_gn
    gn_kw = dict(gn_mode="static", gn_steps=steps) if static_gn else {}
    import dataclasses

    cfg = unet_config_for_res(res, in_channels=3, out_channels=6, dtype="bfloat16",
                              norm_dtype="bfloat16",
                              conv_int8=int8, int8_mode="static")
    cfg = dataclasses.replace(cfg, **gn_kw)
    model = UNet2D(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32), jnp.zeros((1,))
    )
    if int8:
        # static scales from a short calibration run (exact fp32 trajectory)
        from bndm_tpu.ops.int8 import calibrate_sampling

        cal_cfg = unet_config_for_res(res, in_channels=3, out_channels=6,
                                      dtype="bfloat16", norm_dtype="bfloat16",
                                      conv_int8=True, int8_mode="calibrate")
        if static_gn:
            cal_cfg = dataclasses.replace(cal_cfg, gn_mode="calibrate",
                                          gn_steps=steps)
        m_cal = UNet2D(cal_cfg)
        x_cal = jax.random.normal(jax.random.PRNGKey(9), (8, 3, res, res), jnp.float32)
        quant = calibrate_sampling(m_cal, params, x_cal, steps,
                                   scheduler_gamma="sigmoid",
                                   gamma_params=(1000.0, 0.0, 3.0), two_head=True)
        params = {"params": params["params"], "quant": quant}
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res), jnp.float32)

    cache_iv = int(os.environ.get("PROFILE_CACHE_INTERVAL", "0"))
    if cache_iv > 1:
        # feature-reuse chain (VERDICT r3 #3: profile the cached step to
        # cost the shallow shell before pushing interval/depth further)
        from bndm_tpu.samplers.iadb import sample_iadb_cached

        def apply_full(p, x, t):
            return model.apply(p, x, t, return_deep=True)

        def apply_shallow(p, x, t, deep):
            return model.apply(p, x, t, deep_feature=deep)

        def run(params, x0):
            return sample_iadb_cached(
                apply_full, apply_shallow, params, x0, nb_steps=steps,
                cache_interval=cache_iv, scheduler_gamma="sigmoid",
                gamma_params=(1000.0, 0.0, 3.0), two_head=True,
            )
    else:
        def run(params, x0):
            out, _ = sample_iadb(
                model.apply, params, x0,
                nb_steps=steps, scheduler_gamma="sigmoid",
                gamma_params=(1000.0, 0.0, 3.0), two_head=True,
            )
            return out

    _fetch(run(params, x0))  # warmup (compile-cache hit)
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)
    jax.profiler.start_trace(outdir)
    t0 = time.perf_counter()
    _fetch(run(params, x1))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced run: {dt:.2f}s ({batch/dt:.2f} samples/s)", flush=True)
    return dt


def _xplane_pb2():
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
        return xplane_pb2
    except ImportError:
        pass
    try:
        from tsl.profiler.protobuf import xplane_pb2  # type: ignore
        return xplane_pb2
    except ImportError:
        pass
    from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore
    return xplane_pb2


def parse(outdir, top=40):
    xplane_pb2 = _xplane_pb2()
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {outdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    report = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            agg = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name] += ev.duration_ps
                cnt[name] += 1
            if not agg:
                continue
            total_ms = sum(agg.values()) / 1e9
            rows = [
                {"op": n, "ms": round(ps / 1e9, 2), "pct": round(100 * ps / sum(agg.values()), 2),
                 "count": cnt[n]}
                for n, ps in agg.most_common(top)
            ]
            report[f"{plane.name} :: {line.name}"] = {
                "total_ms": round(total_ms, 1), "top": rows}
    return report


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bndm_profile"
    if not os.environ.get("PARSE_ONLY"):
        run_and_trace(outdir)
    rep = parse(outdir, top=int(os.environ.get("PROFILE_TOP", "40")))
    for line_name, data in rep.items():
        print(f"\n== {line_name} (total {data['total_ms']} ms) ==")
        for r in data["top"][:40]:
            print(f"  {r['pct']:6.2f}%  {r['ms']:10.2f} ms  x{r['count']:<6d} {r['op'][:110]}")
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
