"""Unit tests for scripts/analyze_profile.py — the roofline audit that drives
serving-tier decisions (PARITY.md §6). Pins the op-string parser and the
bytes/MACs math on synthetic fusion strings shaped like real xplane output."""

import importlib.util
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "analyze_profile",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "analyze_profile.py"),
)
ap = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ap)


def test_shape_parser():
    s = ("%f = bf16[500,64,64,128]{3,0,2,1:T(8,128)(2,1)} fusion("
         "s8[3,3,128,128]{3,2,1,0} %w, f32[]{:T(128)} %scalar)")
    got = ap.shapes(s)
    assert ("bf16", [500, 64, 64, 128]) in got
    assert ("s8", [3, 3, 128, 128]) in got
    assert ("f32", [1]) in got  # scalar parses as [1]


def test_nbytes():
    assert ap.nbytes("bf16", [500, 64, 64, 128]) == 500 * 64 * 64 * 128 * 2
    assert ap.nbytes("s8", [4]) == 4
    assert ap.nbytes("f32", [2, 3]) == 24


def test_elementwise_fusion_row():
    # pure elementwise: 2 operand tensors + 1 result, no conv weight
    op = ("%fusion.1 = bf16[500,64,64,128]{3,0,2,1} fusion("
          "bf16[500,64,64,128]{3,0,2,1} %a, bf16[500,64,64,128]{3,0,2,1} %b)")
    row = ap.analyze(op, ms=1.0)
    assert row is not None and "conv" not in row
    want_gb = 3 * 500 * 64 * 64 * 128 * 2 / 1e9
    assert row["GB"] == pytest.approx(want_gb, abs=0.01)
    # 1 ms for those bytes -> GB/s == GB * 1000
    assert row["GBps"] == pytest.approx(want_gb * 1000, rel=0.01)
    assert row["hbm_pct"] == pytest.approx(100 * row["GBps"] / ap.V5E_HBM_GBS,
                                           abs=0.2)


def test_conv_fusion_row_detects_macs():
    # s8 conv: weight [3,3,128,128] HWIO + activation [500,64,64,128] NHWC
    op = ("%cf.2 = s8[500,64,64,128]{3,0,2,1} fusion("
          "s8[500,64,64,128]{3,0,2,1} %x, s8[3,3,128,128]{3,2,1,0} %w)")
    row = ap.analyze(op, ms=2.0)
    assert row["conv"] == "s8"
    macs = 500 * 64 * 64 * 3 * 3 * 128 * 128
    want_tops = 2 * macs / 1e12 / (2.0 / 1e3)
    assert row["TOPs"] == pytest.approx(want_tops, rel=0.01)
    assert row["mxu_pct"] == pytest.approx(100 * want_tops / ap.V5E_INT8_TOPS,
                                           rel=0.01)


def test_conv_output_spatial_dims_used():
    # strided conv: output 32x32 from 64x64 input -> MACs use output dims
    op = ("%cf.3 = bf16[500,32,32,256]{3,0,2,1} fusion("
          "bf16[500,64,64,128]{3,0,2,1} %x, bf16[3,3,128,256]{3,2,1,0} %w)")
    row = ap.analyze(op, ms=1.0)
    assert row["conv"] == "bf16"
    macs = 500 * 32 * 32 * 3 * 3 * 128 * 256
    assert row["TOPs"] == pytest.approx(2 * macs / 1e12 / 1e-3, rel=0.01)


def test_non_fusion_and_malformed_ops_skipped():
    assert ap.analyze("%while.1 = (...) while(...)", 1.0) is None
    assert ap.analyze("no equals sign here", 1.0) is None
    # 1x1 "weight" shaped like a bias broadcast must not crash
    op = "%f = f32[8]{0} fusion(f32[8]{0} %b)"
    row = ap.analyze(op, 0.001)
    assert row is not None and "conv" not in row


def test_main_end_to_end(tmp_path, capsys, monkeypatch):
    import json

    summary = {
        "/device:TPU:0 :: XLA Ops": {
            "total_ms": 100.0,
            "top": [
                {"op": "%while.1 = (...) while(...)", "ms": 90.0, "count": 1},
                {"op": ("%fusion.9 = bf16[8,16,16,32]{3,0,2,1} fusion("
                        "bf16[8,16,16,32]{3,0,2,1} %a, "
                        "bf16[3,3,32,32]{3,2,1,0} %w)"),
                 "ms": 250.0, "count": 250},
                {"op": "%rare.op = f32[4]{0} fusion(f32[4]{0} %x)",
                 "ms": 1.0, "count": 3},  # count < steps -> skipped
            ],
        }
    }
    (tmp_path / "summary.json").write_text(json.dumps(summary))
    monkeypatch.setattr(sys, "argv", ["analyze_profile.py", str(tmp_path), "250"])
    ap.main()
    out = capsys.readouterr().out
    assert "analyzed 1 fusions" in out
    assert "MXU peak" in out
