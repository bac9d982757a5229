"""Unit tests for bench.py's capture-proofing logic (r4): incremental JSON
emission (last line wins), headline promotion, the wall-clock budget, and
the gate predicate. The full leg sequence is smoke-tested end to end by
``BENCH_TINY=1 python bench.py`` (not here — it costs minutes)."""

import importlib
import json
import sys


def _bench():
    # bench.py lives at the repo root (not in the package); make sure the
    # module under test is the real one regardless of test cwd
    sys.path.insert(0, ".")
    import bench

    return importlib.reload(bench)


def test_promote_keeps_best(capsys):
    bench = _bench()
    b = bench.Bench()
    b.flops_per_image = 35e9
    b.promote(10.0, 50.0, "bf16")
    b.promote(8.0, 62.5, "slower-tier")  # must NOT replace
    assert b.mode == "bf16" and b.sps == 10.0
    b.promote(12.0, 41.7, "faster-tier")
    assert b.mode == "faster-tier" and b.sps == 12.0


def test_emit_complete_line_each_time(capsys):
    bench = _bench()
    b = bench.Bench()
    b.flops_per_image = 35e9
    b.promote(10.0, 50.0, "bf16")
    b.emit()
    b.extra["cached_sps"] = 15.0
    b.promote(15.0, 33.3, "cached")
    b.emit()
    lines = [line for line in capsys.readouterr().out.splitlines()
             if line.startswith("{")]
    assert len(lines) == 2
    first, last = (json.loads(s) for s in lines)
    # every line is a complete, parseable artifact; the LAST line carries
    # the best headline (the driver keeps the last parseable line)
    assert first["value"] == 10.0 and first["extra"]["mode"] == "bf16"
    assert last["value"] == 15.0 and last["extra"]["mode"] == "cached"
    assert last["extra"]["cached_sps"] == 15.0
    assert last["vs_baseline"] is not None and last["vs_baseline"] > 0
    assert "samples/sec/chip" in last["metric"]


def test_budget_skips(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_BUDGET_S", "0")
    bench = _bench()
    b = bench.Bench()
    assert b.over_budget("late leg") is True
    assert "skipping late leg" in capsys.readouterr().out


def test_gate_predicate():
    bench = _bench()
    assert bench._gate(0.999, 40.0)
    assert not bench._gate(0.98, 40.0)   # SSIM below 0.99
    assert not bench._gate(0.999, 30.0)  # PSNR below 35 dB
