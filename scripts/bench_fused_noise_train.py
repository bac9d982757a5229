"""Fused Pallas noise kernel: measured end-to-end training verdict (r4,
VERDICT r3 weak #4).

The fused RNG->L-matmul->mix kernel (ops/pallas_bluenoise.py::fused_bluenoise)
is exact-tested and opt-in (TrainConfig.noise_engine="fused"), but no
committed number ever compared engine=fused vs engine=xla END TO END. This
script measures BNDM train-step throughput (113.7M res-64 UNet, gaussianBN
noise, dual optimizer) for both engines at bs=64 and bs=256 on the chip.

Decision rule: if fused wins at both batch sizes, flip the TPU training
default; otherwise record the negative in PARITY.md §6 like the
subpixel-conv / Pallas-GN experiments.

Context for expectations: the r2 profile shows the train step dominated by
UNet fwd/bwd convs; the noise engine is ~5 ms/batch at bs=500 (≈0.6 ms at
bs=64) of a ~58 ms step — so even a 2x faster noise path moves the step
<1%. The interesting question is whether the fused kernel at least does not
LOSE (it frees HBM traffic the XLA path spends on the wn round-trip).

Args: [inner] (default 5 timed steps per engine/batch).
"""

import json
import sys
import time  # noqa: F401 (kept for parity with sibling bench scripts)

sys.path.insert(0, ".")
from bench import _bench_train, _setup_compile_cache  # noqa: E402


def main(inner=5):
    import jax

    _setup_compile_cache()
    out = {}
    for batch in (64, 256):
        for engine in ("xla", "fused"):
            sps, dt = _bench_train(batch=batch, inner=inner, engine=engine)
            out[f"{engine}_bs{batch}"] = round(sps, 2)
            print(f"engine={engine} bs={batch}: {sps:.1f} imgs/s "
                  f"({dt * 1e3:.1f} ms/step)", flush=True)
    speedups = {b: round(out[f"fused_bs{b}"] / out[f"xla_bs{b}"], 4)
                for b in (64, 256)}
    wins = all(s > 1.0 for s in speedups.values())
    print(json.dumps({
        "metric": "BNDM train imgs/s/chip: fused Pallas noise vs XLA noise",
        "value": out["fused_bs64"],
        "unit": "imgs/s/chip",
        "extra": {**out, "fused_speedup": speedups,
                  "verdict": "fused wins — flip TPU default" if wins
                  else "no end-to-end win — keep xla default",
                  "device": str(jax.devices()[0])},
    }), flush=True)


if __name__ == "__main__":
    main(*map(int, sys.argv[1:]))
