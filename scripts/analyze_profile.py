"""Roofline audit of a parsed xplane profile (scripts/profile_sampling.py).

Reads the summary.json produced by profile_sampling.py and, for every fusion
in the hot while-body, estimates from the operand/result shapes:
  * bytes moved (sum of operand + result sizes; conv weights counted once)
  * achieved HBM bandwidth = bytes / measured time
  * for fusions containing a conv (recognizable by an s8/bf16/f32 4-D weight
    operand HWIO-shaped [kh, kw, cin, cout]), the MAC count and achieved
    TOP/s vs the v5e peak (394 int8 / 197 bf16)

This quantifies how much software headroom remains per op class: a fusion at
~90% of HBM peak or ~80% of MXU peak cannot be made meaningfully faster by a
custom kernel — only by moving fewer bytes / doing fewer MACs (the serving
tiers' algebraic reductions). Used for the r3 PARITY.md §6 roofline table.

Usage: python scripts/analyze_profile.py /tmp/bndm_profile_gn [steps=250]
"""

import json
import os
import re
import sys

V5E_HBM_GBS = 819.0  # v5e peak HBM bandwidth
V5E_INT8_TOPS = 394.0
V5E_BF16_TOPS = 197.0

DT_BYTES = {"s8": 1, "u8": 1, "bf16": 2, "f16": 2, "f32": 4, "s32": 4,
            "u32": 4, "pred": 1, "s64": 8, "f64": 8}


def shapes(s):
    """[(dtype, [dims...]), ...] for every typed shape literal in the text."""
    out = []
    for m in re.finditer(r"(s8|u8|bf16|f16|f32|s32|u32|pred|s64|f64)\[([0-9,]*)\]", s):
        dt = m.group(1)
        dims = [int(x) for x in m.group(2).split(",") if x] or [1]
        out.append((dt, dims))
    return out


def nbytes(dt, dims):
    n = 1
    for d in dims:
        n *= d
    return n * DT_BYTES[dt]


def analyze(op, ms):
    """Classify one op string; return a row dict or None."""
    if " = " not in op or " fusion(" not in op:
        return None
    lhs, rhs = op.split(" = ", 1)
    outs = shapes(rhs.split(" fusion(")[0]) or shapes(lhs)
    ins = shapes(rhs.split("fusion(", 1)[1]) if "fusion(" in rhs else []
    # bytes: all outputs + all unique operand tensors (>= 2 dims to skip
    # scalars); weights counted once
    total = sum(nbytes(dt, d) for dt, d in outs)
    total += sum(nbytes(dt, d) for dt, d in ins if len(d) >= 2)
    gbs = total / 1e9 / (ms / 1e3) if ms else 0.0

    # conv detection: 4-D [kh,kw,cin,cout] weight with small kh/kw and a 4-D
    # activation whose last dim == cin
    macs = 0
    conv_dt = None
    for dt_w, dw in ins:
        if len(dw) != 4 or dw[0] > 7 or dw[1] > 7 or dw[0] != dw[1]:
            continue
        kh, kw, cin, cout = dw
        for dt_a, da in ins:
            if len(da) == 4 and da[3] == cin and da[0] > 7:
                b, h, w, _ = da
                # output spatial dims: use the fusion result if 4-D
                oh, ow = h, w
                for dt_o, do in outs:
                    if len(do) == 4 and do[3] == cout:
                        oh, ow = do[1], do[2]
                        break
                macs = b * oh * ow * kh * kw * cin * cout
                conv_dt = dt_w
                break
        if macs:
            break
    row = {"ms": round(ms, 3), "GB": round(total / 1e9, 3),
           "GBps": round(gbs, 0)}
    if macs:
        tops = 2 * macs / 1e12 / (ms / 1e3)
        peak = V5E_INT8_TOPS if conv_dt == "s8" else V5E_BF16_TOPS
        row.update({"conv": conv_dt, "TOPs": round(tops, 1),
                    "mxu_pct": round(100 * tops / peak, 1)})
    else:
        row.update({"hbm_pct": round(100 * gbs / V5E_HBM_GBS, 1)})
    return row


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bndm_profile_gn"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    rep = json.load(open(os.path.join(outdir, "summary.json")))
    key = next((k for k in rep if "XLA Ops" in k and "Async" not in k), None)
    if key is None:
        sys.exit(f"no 'XLA Ops' line in {outdir}/summary.json "
                 f"(planes: {sorted(rep)}) — was this a TPU trace parsed by "
                 "scripts/profile_sampling.py?")
    rows = []
    dropped_n = 0
    dropped_ms = 0.0
    for r in rep[key]["top"]:
        if r["op"].startswith("%while") or r["count"] < steps:
            continue
        a = analyze(r["op"], r["ms"] / steps)
        if a is None:
            # non-fusion device op (standalone conv/custom-call/reduce/...)
            # or unparsed shapes — report, don't silently understate coverage
            dropped_n += 1
            dropped_ms += r["ms"] / steps
            continue
        a["name"] = r["op"].split(" = ")[0]
        rows.append(a)
    rows.sort(key=lambda r: -r["ms"])
    print(f"{'op':34s} {'ms/step':>8s} {'GB':>7s} {'GB/s':>6s}  roofline")
    tot_ms = tot_conv = tot_elem = 0.0
    for a in rows:
        roof = (f"{a['mxu_pct']}% of {a['conv']} MXU peak" if "conv" in a
                else f"{a['hbm_pct']}% of HBM peak")
        print(f"{a['name']:34s} {a['ms']:8.3f} {a['GB']:7.3f} {a['GBps']:6.0f}  {roof}")
        tot_ms += a["ms"]
        if "conv" in a:
            tot_conv += a["ms"]
        else:
            tot_elem += a["ms"]
    print(f"\nanalyzed {len(rows)} fusions: {tot_ms:.1f} ms/step "
          f"({tot_conv:.1f} conv-containing, {tot_elem:.1f} elementwise)")
    if dropped_n:
        print(f"NOT analyzed (non-fusion/unparsed per-step device ops): "
              f"{dropped_n} ops totaling {dropped_ms:.2f} ms/step")


if __name__ == "__main__":
    main()
