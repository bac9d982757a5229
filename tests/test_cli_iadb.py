"""End-to-end smoke of the flag-compatible iadb_bn CLI: train -> test ->
superres train/test, all with a tiny model on synthetic data (CPU)."""

import os

import numpy as np
import pytest

from bndm_tpu.data.imagefolder import make_synthetic_folder


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_synthetic_folder(str(tmp_path / "data" / "tinycat"), n=8, res=64)
    make_synthetic_folder(str(tmp_path / "data" / "tinycat_train"), n=8, res=64)
    make_synthetic_folder(str(tmp_path / "data" / "tinycat_test"), n=4, res=64)
    # pre-seed a cheap generated L so the CLI doesn't do a 4096-cholesky
    rng = np.random.default_rng(0)
    n = 4096
    L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.01)
    np.fill_diagonal(L, 1.0)
    os.makedirs("bluenoise", exist_ok=True)
    np.savez_compressed("bluenoise/cov_gaussianBN_L_res64_d3.npz", x=L)
    return tmp_path


COMMON = [
    "--dataset=tinycat", "--res=64", "--batch_size=4", "--tiny_model",
    "--noise_type=gaussianBN", "--scheduler_gamma=sigmoid", "--scheduler_param=0.2",
    "--out_channel=6", "--compute_dtype=float32", "--nb_steps=20",
]


def test_train_then_test(workdir):
    from bndm_tpu.cli.iadb_bn import main

    main(COMMON + ["--train_or_test=train", "--epochs=1", "--max_steps=2", "--lr=1e-4"])
    out = workdir / "results_gaussianBN" / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0"
    assert (out / "model.npz").exists()
    assert (out / "losses.txt").exists()

    main(COMMON + ["--train_or_test=test", "--test_samples=4", "--save_all_samples"])
    imgdir = out / "tinycat_iadb_gwn2gbn_steps20" / "images"
    assert len(list(imgdir.glob("*.png"))) == 4
    seqdir = out / "tinycat_iadb_gwn2gbn_steps20" / "seqs"
    assert len(list(seqdir.glob("*.png"))) > 0


def test_superres_train_then_test(workdir):
    from bndm_tpu.cli.iadb_bn import main

    args = COMMON + ["--is_conditional", "--conditional_type=superres"]
    main(args + ["--train_or_test=train", "--epochs=1", "--max_steps=2"])
    out = (workdir / "results_gaussianBN_superres"
           / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0")
    assert (out / "model.npz").exists()
    main(args + ["--train_or_test=test", "--test_samples=2"])
    imgdir = out / "tinycat_iadb_gwn2gbn_superres_steps20" / "images"
    assert len(list(imgdir.glob("*.png"))) > 0


def test_superres_serving_tiers(workdir, capsys):
    """Conditional super-res with --conv_int8 --int8_mode=static --static_gn
    (r4): calibrate_sampling threads the concat([x, x_c], 1) conditioning
    through the calibration trajectory, then static serving samples."""
    from bndm_tpu.cli.iadb_bn import main

    args = COMMON + ["--is_conditional", "--conditional_type=superres"]
    main(args + ["--train_or_test=train", "--epochs=1", "--max_steps=2"])
    main(args + ["--train_or_test=test", "--test_samples=2",
                 "--conv_int8", "--int8_mode=static", "--static_gn"])
    out = (workdir / "results_gaussianBN_superres"
           / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0")
    imgdir = out / "tinycat_iadb_gwn2gbn_superres_steps20" / "images"
    assert len(list(imgdir.glob("*.png"))) > 0
    assert "serving calibration" in capsys.readouterr().out


def test_int8_static_serving_path(workdir):
    """--conv_int8 --int8_mode=static: auto-calibration + static sampling
    through the CLI (the validated serving configuration, PARITY.md §6)."""
    from bndm_tpu.cli.iadb_bn import main

    main(COMMON + ["--train_or_test=train", "--epochs=1", "--max_steps=2", "--lr=1e-4"])
    main(COMMON + ["--train_or_test=test", "--test_samples=2",
                   "--save_all_samples", "--conv_int8", "--int8_mode=static"])
    out = workdir / "results_gaussianBN" / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0"
    imgdir = out / "tinycat_iadb_gwn2gbn_steps20" / "images"
    assert len(list(imgdir.glob("*.png"))) == 2


def test_static_gn_serving_path(workdir, capsys):
    """--static_gn (+ --conv_int8): joint conv+GN calibration + static
    serving through the CLI (the r3 gate-passed configuration), plus the
    linear-alpha guard."""
    import pytest

    from bndm_tpu.cli.iadb_bn import main

    main(COMMON + ["--train_or_test=train", "--epochs=1", "--max_steps=2", "--lr=1e-4"])
    main(COMMON + ["--train_or_test=test", "--test_samples=2",
                   "--save_all_samples", "--conv_int8", "--int8_mode=static",
                   "--static_gn", "--microbatch=1"])
    out = workdir / "results_gaussianBN" / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0"
    imgdir = out / "tinycat_iadb_gwn2gbn_steps20" / "images"
    assert len(list(imgdir.glob("*.png"))) == 2
    assert "serving calibration" in capsys.readouterr().out

    with pytest.raises(SystemExit, match="linear alpha"):
        main(COMMON + ["--train_or_test=test", "--test_samples=2",
                       "--static_gn", "--scheduler_alpha=sigmoid"])


def test_attn_softmax_relaxation_cli(workdir):
    """--attn_softmax_dtype=bfloat16 is honored both with the calibrated
    serving tiers and standalone (no silent no-op)."""
    from bndm_tpu.cli.iadb_bn import main

    main(COMMON + ["--train_or_test=train", "--epochs=1", "--max_steps=2", "--lr=1e-4"])
    # standalone relaxation (no int8/static-GN): must still sample
    main(COMMON + ["--train_or_test=test", "--test_samples=2",
                   "--save_all_samples", "--attn_softmax_dtype=bfloat16"])
    out = workdir / "results_gaussianBN" / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0"
    imgdir = out / "tinycat_iadb_gwn2gbn_steps20" / "images"
    assert len(list(imgdir.glob("*.png"))) == 2
    # riding the full serving tier — clear the leftovers first so the count
    # asserts on THIS leg's output, not the previous one's
    for f in imgdir.glob("*.png"):
        f.unlink()
    main(COMMON + ["--train_or_test=test", "--test_samples=2",
                   "--save_all_samples", "--conv_int8", "--int8_mode=static",
                   "--static_gn", "--attn_softmax_dtype=bfloat16"])
    assert len(list(imgdir.glob("*.png"))) == 2


def test_microbatch_remainder_padding(workdir):
    """A non-divisible last gallery batch (7 = 4 + 3 with --microbatch=2)
    still goes through the microbatched scan — zero-padded to the next
    multiple and sliced back — never silently through the full-batch
    sampler (the documented bs>=1000 HBM-OOM path)."""
    from bndm_tpu.cli.iadb_bn import main

    main(COMMON + ["--train_or_test=train", "--epochs=1", "--max_steps=2",
                   "--lr=1e-4"])
    main(COMMON + ["--train_or_test=test", "--test_samples=7",
                   "--save_all_samples", "--microbatch=2"])
    out = (workdir / "results_gaussianBN"
           / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0")
    imgdir = out / "tinycat_iadb_gwn2gbn_steps20" / "images"
    assert len(list(imgdir.glob("*.png"))) == 7

def test_cache_interval_serving_path(workdir):
    """--cache_interval=2: the feature-reuse (block-caching) tier through the
    CLI — full-batch cached chain, then composed with --microbatch, then the
    conditional (super-res) cached chain with x_c threaded (r4)."""
    from bndm_tpu.cli.iadb_bn import main

    main(COMMON + ["--train_or_test=train", "--epochs=1", "--max_steps=2",
                   "--lr=1e-4"])
    out = (workdir / "results_gaussianBN"
           / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0")
    imgdir = out / "tinycat_iadb_gwn2gbn_steps20" / "images"

    main(COMMON + ["--train_or_test=test", "--test_samples=2",
                   "--save_all_samples", "--cache_interval=2"])
    assert len(list(imgdir.glob("*.png"))) == 2
    for f in imgdir.glob("*.png"):
        f.unlink()

    main(COMMON + ["--train_or_test=test", "--test_samples=4",
                   "--save_all_samples", "--cache_interval=2",
                   "--microbatch=2", "--conv_int8", "--int8_mode=static"])
    assert len(list(imgdir.glob("*.png"))) == 4

    # conditional super-res with the cached chain (x_c through full AND
    # shallow forwards), composed with the calibrated static tiers
    cond = COMMON + ["--is_conditional", "--conditional_type=superres"]
    main(cond + ["--train_or_test=train", "--epochs=1", "--max_steps=2"])
    cout = (workdir / "results_gaussianBN_superres"
            / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0")
    cimg = cout / "tinycat_iadb_gwn2gbn_superres_steps20" / "images"
    main(cond + ["--train_or_test=test", "--test_samples=2",
                 "--cache_interval=2", "--conv_int8", "--int8_mode=static",
                 "--static_gn"])
    assert len(list(cimg.glob("*.png"))) > 0


def test_async_image_writer(tmp_path):
    """AsyncImageWriter (r5 gallery I/O overlap): writes all submitted
    batches, counts images, and surfaces encode errors on close()."""
    import pytest

    from bndm_tpu.cli.common import AsyncImageWriter

    w = AsyncImageWriter(max_queue=2)
    a = np.zeros((3, 3, 8, 8), np.float32)
    w.submit(a, str(tmp_path / "b0_{0}.png"))
    w.submit(a, str(tmp_path / "b1_{0}.png"))
    assert w.close() == 6
    assert sorted(p.name for p in tmp_path.glob("*.png")) == [
        f"b{b}_{i}.png" for b in range(2) for i in range(3)]

    w2 = AsyncImageWriter()
    w2.submit(a, str(tmp_path / "nodir" / "deeper" / "x_{0}.png"))
    with pytest.raises(Exception):
        w2.close()
