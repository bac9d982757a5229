"""Pixel-space IADB/BNDM pipeline CLI — flag-compatible with the reference.

TPU-native counterpart of reference ``iadb_bn.py``: same argparse surface
(:29-69), same output-folder naming, same train/test modes (unconditional +
super-res conditional), but the work runs as jitted JAX: one compiled train
step, one compiled 250-step sampling scan, data-parallel over all local
devices.

Usage (reference scripts work verbatim with `python -m bndm_tpu.cli.iadb_bn`):
  train: --dataset=cat_res64 --res=64 --batch_size=64 --epochs=1000 \
         --train_or_test=train --lr=0.0001 --grad_clip=1.0 \
         --noise_type=gaussianBN --scheduler_gamma=sigmoid \
         --scheduler_param=1000 --out_channel=6
  test:  --dataset=cat_res64 --res=64 --batch_size=500 --train_or_test=test \
         --nb_steps=250 --test_samples=30000 --noise_type=gaussianBN ...
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from bndm_tpu.cli.hf_args import cache_interval_type


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # mirror of reference iadb_bn.py:29-69 (superset-free: every flag kept)
    p.add_argument("--dataset", type=str, default="celeba_small")
    p.add_argument("--noise_type", type=str, default="gaussian")
    p.add_argument("--optimizer_type", type=str, default="adamw")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--train_or_test", type=str, default="train")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nb_steps", type=int, default=1000)
    p.add_argument("--scheduler_alpha", type=str, default="linear")
    p.add_argument("--scheduler_gamma", type=str, default="linear")
    p.add_argument("--scheduler_param", type=float, default=0.02)
    p.add_argument("--scheduler_param_s", type=float, default=0)
    p.add_argument("--scheduler_param_e", type=float, default=3)
    p.add_argument("--blue_noise_blur", type=float, default=None)
    p.add_argument("--activation", type=str, default="silu")
    p.add_argument("--early_stopping_step", type=int, default=50)
    p.add_argument("--split_step", type=int, default=900)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--mode_index", type=int, default=1)
    p.add_argument("--reg_weight", type=float, default=1)
    p.add_argument("--alpha_min", type=float, default=0.0)
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--deterministic", type=int, default=1)
    p.add_argument("--resume_training", action="store_true")
    p.add_argument("--optimize_scheduler_param", action="store_true")
    p.add_argument("--remap", action="store_true")
    p.add_argument("--is_conditional", action="store_true")
    p.add_argument("--conditional_type", type=str, default="superres")
    p.add_argument("--fine_tune_mode_index", type=int, default=0)
    p.add_argument("--skip", type=int, default=1)
    p.add_argument("--test_samples", type=int, default=10)
    p.add_argument("--out_channel", type=int, default=6)
    # bndm-tpu extensions
    p.add_argument("--data_root", type=str, default="./data")
    p.add_argument("--bluenoise_dir", type=str, default="bluenoise")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--norm_dtype", type=str, default="float32",
                   help="GroupNorm compute dtype; float32 is diffusers "
                        "parity, bfloat16 is the gated serving relaxation "
                        "(SSIM 1.0 / PSNR 76 dB vs fp32, 1.109x — "
                        "scripts/bench_gn_fidelity.py)")
    p.add_argument("--max_steps", type=int, default=None, help="cap train steps (smoke runs)")
    p.add_argument("--tiny_model", action="store_true",
                   help="swap in a tiny UNet (CI / smoke tests only)")
    p.add_argument("--save_all_samples", action="store_true",
                   help="save every sample of every batch (the reference's "
                        "replicability mode saves only sample 0 of selected batches)")
    p.add_argument("--save_noise", action="store_true",
                   help="save each batch's initial noise as noise_batch{B}_idx{i}.npz "
                        "(the reference's replicability artifacts, iadb_bn.py:781-783) "
                        "so DDIM/BNDM runs can consume identical x0")
    p.add_argument("--export_reference_ckpt", action="store_true",
                   help="also write a torch model.ckpt each epoch (the "
                        "reference's format, iadb_bn.py:1028) for ecosystem "
                        "round-trips")
    p.add_argument("--noise_engine", type=str, default="auto",
                   choices=["auto", "xla", "fused"],
                   help="training-noise engine: 'auto' (default) uses the "
                        "fused TPU Pallas RNG+matmul+mix kernel where "
                        "eligible (res-64 fresh noise on TPU; measured "
                        "1.06x train at bs=64) and XLA elsewhere; 'xla' "
                        "keeps the cross-backend-reproducible stream")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize UNet activations (bigger batches per chip)")
    p.add_argument("--conv_int8", action="store_true",
                   help="run the UNet's hot convs W8A8 on the int8 MXU "
                        "(resnet conv1/conv2 + upsamplers; see ops/int8.py)")
    p.add_argument("--int8_mode", type=str, default="static",
                   choices=["dynamic", "static"],
                   help="with --conv_int8 at test time: 'static' (default) "
                        "auto-calibrates constant activation scales on one "
                        "exact small-batch trajectory first — the validated "
                        "serving path (1.116x bf16, SSIM 1.0/PSNR 49 dB vs "
                        "bf16); 'dynamic' quantizes per call (slower, no "
                        "calibration). Training always uses dynamic (QAT)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of one sampling batch "
                        "(view with TensorBoard/xprof)")
    p.add_argument("--static_gn", action="store_true",
                   help="serving: collapse every GroupNorm to a fused FMA "
                        "with per-(site,step) statistics calibrated on one "
                        "exact trajectory (ops/static_norm.py). Gate-passed "
                        "on v5e: 1.139x over exact-GN int8-static at SSIM "
                        "0.9996 / PSNR 40.4 dB. Requires linear alpha; "
                        "composes with --conv_int8")
    p.add_argument("--attn_softmax_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="serving: attention softmax dtype. fp32 is the "
                        "diffusers-parity default; bfloat16 removes the "
                        "layout-changing fp32 upcast fusions of the logits "
                        "(~3%% of the serving step, r3 profile) — fidelity-"
                        "gated in scripts/bench_static_gn.py")
    p.add_argument("--microbatch", type=int, default=None,
                   help="gallery serving: denoise each --batch_size batch as "
                        "one compiled scan over microbatches of this size "
                        "(holds only one microbatch's UNet activations — "
                        "breaks the bs=500 HBM ceiling for 30k-sample runs; "
                        "seqs/ frames are skipped in this mode)")
    p.add_argument("--cache_interval", type=cache_interval_type, default=None,
                   help="serving: feature-reuse (block-caching) tier, cf. "
                        "block caching (arXiv:2312.03209) — every Nth step runs "
                        "the full UNet, the steps between recompute only the "
                        "outer --cache_depth shell around the cached trunk "
                        "output (samplers.iadb.sample_iadb_cached; fidelity-"
                        "gated in scripts/bench_deepcache.py). Unconditional "
                        "test only; seqs/ frames are skipped")
    p.add_argument("--cache_depth", type=int, default=1,
                   help="with --cache_interval: how many outer down/up "
                        "blocks a cached step recomputes (1 = only the "
                        "full-resolution shell)")
    p.add_argument("--gn_carry", action="store_true",
                   help="with --cache_interval: GN-stats-carry tier — the "
                        "group's full step records its per-sample GroupNorm "
                        "statistics and the shallow steps normalize with "
                        "them instead of re-reducing (ops/static_norm.py "
                        "record/reuse). Keeps the per-sample content "
                        "dependence that makes --static_gn fail on trained "
                        "weights (TRAINED_GATES.json); mutually exclusive "
                        "with --static_gn")
    # multi-host launch (replaces the reference's `accelerate launch`,
    # ddim_diffusers.py:295-301): run one process per host with the same
    # flags plus these three; on TPU pods with a cluster env all three are
    # auto-detected and can be omitted (jax.distributed.initialize defaults)
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multi-host training)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args(argv)


def build(opt):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import load_L_for, output_folder_name
    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.train.pixel import TrainConfig

    if opt.noise_type not in ("gaussianBN", "gaussianRN"):
        opt.out_channel = 3  # reference iadb_bn.py:476-479

    in_ch = 6 if opt.is_conditional else 3  # superres concat (iadb_bn.py:556-558)
    if opt.tiny_model:
        from bndm_tpu.models.unet2d import UNet2DConfig

        mcfg = UNet2DConfig(
            in_channels=in_ch, out_channels=opt.out_channel,
            block_out_channels=(8, 16),
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            attention_head_dim=4, norm_num_groups=4,
            act_fn=opt.activation, dtype=opt.compute_dtype, conv_int8=opt.conv_int8,
        )
    else:
        mcfg = unet_config_for_res(opt.res, in_channels=in_ch, out_channels=opt.out_channel,
                                   act_fn=opt.activation, dtype=opt.compute_dtype,
                                   conv_int8=opt.conv_int8)
    if opt.cache_depth != 1:
        import dataclasses

        mcfg = dataclasses.replace(mcfg, cache_depth=opt.cache_depth)
    if opt.norm_dtype != "float32":
        import dataclasses

        mcfg = dataclasses.replace(mcfg, norm_dtype=opt.norm_dtype)
    if opt.attn_softmax_dtype != "float32" and opt.train_or_test == "train":
        # honored in training too (no silent no-op); test mode applies it to
        # the serving model only, keeping calibration on the exact path
        import dataclasses

        print(f"NOTE: training with attention softmax in {opt.attn_softmax_dtype}")
        mcfg = dataclasses.replace(mcfg, attn_softmax_dtype=opt.attn_softmax_dtype)
    model = UNet2D(mcfg)
    tcfg = TrainConfig(
        nb_steps=opt.nb_steps,
        noise_type=opt.noise_type,
        scheduler_alpha=opt.scheduler_alpha,
        alpha_param=opt.scheduler_param,
        scheduler_gamma=opt.scheduler_gamma,
        gamma_defaults=(opt.scheduler_param, opt.scheduler_param_s, opt.scheduler_param_e),
        optimize_scheduler_param=opt.optimize_scheduler_param,
        out_channel=opt.out_channel,
        lr=opt.lr,
        optimizer_type=opt.optimizer_type,
        grad_clip=opt.grad_clip,
        remap=opt.remap,
        conditional=opt.is_conditional,
        noise_engine=opt.noise_engine,
        remat=opt.remat,
    )
    L = load_L_for(opt.noise_type, opt.bluenoise_dir)
    out_dir = output_folder_name(opt)
    return model, tcfg, L, out_dir


def run_train(opt):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import save_params
    from bndm_tpu.data.imagefolder import BatchLoader, ImageFolderDataset
    from bndm_tpu.parallel.mesh import auto_mesh, replicate, shard_host_local_batch
    from bndm_tpu.train.pixel import PixelTrainer

    model, tcfg, L, out_dir = build(opt)
    os.makedirs(out_dir, exist_ok=True)
    print("output_folder:", out_dir)

    suffix = "_train" if opt.is_conditional else ""
    ds = ImageFolderDataset(os.path.join(opt.data_root, opt.dataset + suffix), opt.res,
                            random_flip=True, seed=opt.seed)
    # each host loads its slice of the global batch (no-op single-host)
    from bndm_tpu.parallel.distributed import host_shard_info

    shard_index, shard_count = host_shard_info()
    if opt.batch_size % shard_count:
        raise ValueError(f"--batch_size={opt.batch_size} must divide across "
                         f"{shard_count} processes")
    loader = BatchLoader(ds, opt.batch_size // shard_count, seed=opt.seed,
                         shard_index=shard_index, shard_count=shard_count)
    is_main = shard_index == 0

    key = jax.random.PRNGKey(opt.seed)
    trainer = PixelTrainer(model, tcfg, L, key)

    from bndm_tpu.ckpt.manager import CheckpointManager
    from bndm_tpu.utils.logging import MetricLogger, save_loss_curve, save_sched_param_curves

    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    start_step = 0
    if opt.resume_training:
        # full-state resume (params + both optimizers + sched params + step);
        # falls back to the reference's weights-only model file
        restored = mgr.restore(trainer.state)
        if restored is not None:
            trainer.state = restored
            start_step = int(np.asarray(restored.step))
            print(f"resumed full state at step {start_step}")
        else:
            try:
                from bndm_tpu.cli.common import load_pixel_unet_params

                trainer.state = trainer.state._replace(
                    params=load_pixel_unet_params(out_dir))
                print("resumed weights only (reference-style, "
                      "model.npz or torch model.ckpt)")
            except FileNotFoundError:
                pass

    mesh = auto_mesh(opt.batch_size)
    trainer.state = replicate(mesh, trainer.state)
    logger = MetricLogger(os.path.join(out_dir, "logs")) if is_main else None

    losses = []
    sp_hist = [[], [], []]
    step = start_step
    t0 = time.time()
    for epoch in range(opt.epochs):
        epoch_metrics = []  # device scalars; fetched once per epoch (no
        # per-step host sync — keeps the TPU pipeline full)
        for batch in loader.epoch(epoch):
            batch = shard_host_local_batch(mesh, np.asarray(batch))
            m = trainer.step(batch, jax.random.fold_in(key, step))
            epoch_metrics.append(m)
            step += 1
            if opt.max_steps and step >= opt.max_steps:
                break
        for em in epoch_metrics:
            losses.append(float(em["loss"]))
            for j, k in enumerate(("sched_tau", "sched_s", "sched_e")):
                sp_hist[j].append(float(em[k]))
        if logger is not None:
            for off, em in enumerate(epoch_metrics):
                logger.log({"loss": float(em["loss"])}, step - len(epoch_metrics) + off)
        m = epoch_metrics[-1]
        print(f"epoch {epoch}: mean loss {np.mean(losses[-max(len(loader),1):]):.2f} "
              f"sched_params tau={float(m['sched_tau']):.4f} s={float(m['sched_s']):.4f} "
              f"e={float(m['sched_e']):.4f} ({step} steps, {time.time()-t0:.0f}s)")
        if is_main:  # artifact writes: main process only (multi-host)
            np.savetxt(os.path.join(out_dir, "losses.txt"), np.asarray(losses))
            np.savetxt(os.path.join(out_dir, "scheduler_params.txt"),
                       np.asarray(trainer.state.sched_params))
            save_loss_curve(losses, os.path.join(out_dir, "losses.png"))
            save_sched_param_curves(*sp_hist, os.path.join(out_dir, "scheduler_params.png"))
            save_params(os.path.join(out_dir, "model.npz"), trainer.state.params)
        mgr.save(step, trainer.state)
        if is_main and opt.export_reference_ckpt:
            # torch state_dict at the reference's path/format (iadb_bn.py:1028)
            # so bndm-tpu-trained models load in the reference ecosystem
            from bndm_tpu.models.convert import export_torch_ckpt

            export_torch_ckpt(jax.device_get(trainer.state.params),
                              os.path.join(out_dir, "model.ckpt"))
        if opt.max_steps and step >= opt.max_steps:
            break
    mgr.wait()
    mgr.close()
    if logger is not None:
        logger.close()
    return out_dir


def run_test(opt):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import load_pixel_unet_params, noise_folder_name, save_image_grid, serving_relax_kw
    from bndm_tpu.parallel.mesh import auto_mesh, replicate, shard_batch
    from bndm_tpu.samplers.iadb import sample_iadb

    model, tcfg, L, out_dir = build(opt)
    fname = f"{opt.dataset}_iadb_{noise_folder_name(opt.noise_type)}_steps{opt.nb_steps}"
    if opt.is_conditional:
        fname = f"{opt.dataset}_iadb_{noise_folder_name(opt.noise_type)}_{opt.conditional_type}_steps{opt.nb_steps}"
    for sub in ("images", "seqs", "noise"):
        os.makedirs(os.path.join(out_dir, fname, sub), exist_ok=True)

    params = load_pixel_unet_params(out_dir)
    if opt.optimize_scheduler_param:
        sp = np.loadtxt(os.path.join(out_dir, "scheduler_params.txt")).astype(np.float32)
    else:
        sp = np.array([opt.scheduler_param, opt.scheduler_param_s, opt.scheduler_param_e],
                      np.float32)
    # gamma_params is passed to the samplers as a 3-float TUPLE, not an
    # array: the jit pytree structure is part of the persistent-compile-cache
    # key, and bench.py's programs use the tuple form — an array leaf here
    # would force a fresh 113M-UNet compile for the gallery run

    if opt.static_gn and opt.scheduler_alpha != "linear":
        raise SystemExit("--static_gn requires the linear alpha schedule "
                         "(the per-step GN tables are indexed by "
                         "round(alpha*T) — ops/static_norm.py)")
    if opt.gn_carry and opt.static_gn:
        raise SystemExit("--gn_carry and --static_gn both replace GroupNorm "
                         "— pick one")
    if opt.gn_carry and not (opt.cache_interval and opt.cache_interval > 1):
        raise SystemExit("--gn_carry reuses stats across a cached group — "
                         "it requires --cache_interval > 1")
    # serving path: calibrate constant conv activation scales and/or
    # per-(site,step) GroupNorm statistics on ONE exact small-batch
    # trajectory, then sample with static constants — int8-static is
    # 1.116x bf16 at SSIM 1.0 / PSNR 49 dB; +static-GN is a further
    # 1.139x at SSIM 0.9996 / PSNR 40.4 dB (PARITY.md §6)
    from bndm_tpu.serving import serving_model_pair

    m_cal, model = serving_model_pair(
        model.cfg, int8_static=opt.conv_int8 and opt.int8_mode == "static",
        static_gn=opt.static_gn, gn_steps=opt.nb_steps,
        relax_kw=serving_relax_kw(opt))
    if m_cal is not None:
        from bndm_tpu.ops.int8 import calibrate_sampling

        ckey = jax.random.fold_in(jax.random.PRNGKey(opt.seed), 777)
        x_cal = jax.random.normal(
            ckey, (min(8, opt.batch_size), 3, opt.res, opt.res), jnp.float32)
        t0 = time.time()
        quant = calibrate_sampling(
            m_cal, params, x_cal, opt.nb_steps,
            scheduler_alpha=opt.scheduler_alpha, alpha_param=opt.scheduler_param,
            scheduler_gamma=opt.scheduler_gamma, gamma_params=tuple(float(v) for v in sp),
            two_head=tcfg.two_head)
        params = {"params": params.get("params", params), "quant": quant}
        print(f"serving calibration: {time.time()-t0:.1f}s "
              f"({len(jax.tree_util.tree_leaves(quant))} calibrated sites)")

    # gallery-scale sampling shards the batch across chips (replaces the
    # reference's DataParallel scatter/gather, iadb_bn.py:716)
    mesh = auto_mesh(opt.batch_size)
    params = replicate(mesh, params)

    L = jnp.asarray(L)
    total = opt.test_samples
    nb_batches = -(-total // opt.batch_size)
    key = jax.random.PRNGKey(opt.seed)
    times = []
    cnt = 0
    # paper-replicability batch filter (reference iadb_bn.py:744-753): for the
    # published datasets only specific batch indices are sampled
    replicability_batches = {
        "cat_res64": [4], "cat_res128": [52], "celeba_res64": [37],
        "celeba_res128": [10], "church_res64": [4, 23, 32, 36],
    }.get(opt.dataset)

    # defined ONCE (not per batch): these closures are static jit args of the
    # cached sampler, and fresh function objects would retrace every batch
    caching = opt.cache_interval is not None and opt.cache_interval > 1

    # gallery mode writes every sample: encode PNGs on a background thread so
    # the 1-core host's PIL encode overlaps the next batch's device sampling
    # (reference workload total_num=30000, iadb_bn.py:719-816; VERDICT r4 #2)
    from bndm_tpu.cli.common import AsyncImageWriter

    writer = AsyncImageWriter() if opt.save_all_samples else None
    wall_t0 = time.time()

    if opt.gn_carry:
        import dataclasses

        from bndm_tpu.models.unet2d import UNet2D

        m_rec = UNet2D(dataclasses.replace(model.cfg, gn_mode="record"))
        m_reu = UNet2D(dataclasses.replace(model.cfg, gn_mode="reuse"))

        def apply_full(p, x, t):
            (d, deep), gv = m_rec.apply(p, x, t, return_deep=True,
                                        mutable=["gnstats"])
            return d, (deep, gv["gnstats"])

        def apply_shallow(p, x, t, pack):
            deep, stats = pack
            return m_reu.apply(dict(p, gnstats=stats), x, t,
                               deep_feature=deep)
    else:
        def apply_full(p, x, t):
            return model.apply(p, x, t, return_deep=True)

        def apply_shallow(p, x, t, deep):
            return model.apply(p, x, t, deep_feature=deep)

    for i in range(nb_batches):
        if replicability_batches is not None and not opt.save_all_samples \
                and i not in replicability_batches:
            continue
        bs = min(opt.batch_size, total - i * opt.batch_size)
        bkey = jax.random.fold_in(key, i)
        # saved-noise replicability: reuse reference .npz when present
        noise_path = os.path.join(
            "results_gaussianBN",
            f"{opt.dataset}_gaussian_linear_outc3_seed0",
            f"{opt.dataset}_iadb_gwn_steps250", "noise",
            f"noise_batch{opt.batch_size}_idx{i:05d}.npz",
        )
        if os.path.exists(noise_path):
            x0 = jnp.asarray(np.load(noise_path)["noise"][:bs], jnp.float32)
        else:
            x0 = jax.random.normal(bkey, (bs, 3, opt.res, opt.res), jnp.float32)

        if opt.save_noise:
            np.savez_compressed(
                os.path.join(out_dir, fname, "noise",
                             f"noise_batch{bs}_idx{i:05d}.npz"),
                noise=np.asarray(x0))

        if replicability_batches is not None and not opt.save_all_samples:
            # reference slices to ONE sample in replicability mode
            # (iadb_bn.py:766 "replicability, only one sample") — avoid
            # denoising the full 500-image batch to reproduce a single figure
            x0 = x0[0:1]
            bs = 1

        if x0.shape[0] % mesh.devices.size == 0:
            x0 = shard_batch(mesh, x0)

        # Any batch larger than the microbatch goes through the microbatched
        # scan — never silently through the full-batch sampler (that is the
        # documented bs>=1000 HBM-OOM path). Non-divisible remainders (last
        # gallery batch) are zero-padded to the next multiple and sliced
        # back; samples are independent so pad rows cannot perturb real ones.
        use_mb = opt.microbatch and x0.shape[0] > opt.microbatch
        mb_pad = (-x0.shape[0]) % opt.microbatch if use_mb else 0

        def _run():
            if use_mb:
                from bndm_tpu.samplers.iadb import sample_iadb_microbatched

                xin = jnp.array(x0)
                if mb_pad:
                    xin = jnp.concatenate(
                        [xin, jnp.zeros((mb_pad,) + xin.shape[1:], xin.dtype)])
                s = sample_iadb_microbatched(
                    apply_full if caching else model.apply, params, xin,
                    microbatch=opt.microbatch,
                    nb_steps=opt.nb_steps, scheduler_alpha=opt.scheduler_alpha,
                    alpha_param=opt.scheduler_param,
                    scheduler_gamma=opt.scheduler_gamma,
                    gamma_params=tuple(float(v) for v in sp), two_head=tcfg.two_head,
                    apply_shallow_fn=apply_shallow if caching else None,
                    cache_interval=opt.cache_interval if caching else None,
                )
                if mb_pad:
                    s = s[: x0.shape[0]]
                return jax.block_until_ready(s), None
            if caching:
                from bndm_tpu.samplers.iadb import sample_iadb_cached

                s = sample_iadb_cached(
                    apply_full, apply_shallow, params, x0,
                    nb_steps=opt.nb_steps, cache_interval=opt.cache_interval,
                    scheduler_alpha=opt.scheduler_alpha,
                    alpha_param=opt.scheduler_param,
                    scheduler_gamma=opt.scheduler_gamma,
                    gamma_params=tuple(float(v) for v in sp), two_head=tcfg.two_head,
                )
                return jax.block_until_ready(s), None
            s, f = sample_iadb(
                model.apply, params, x0,
                nb_steps=opt.nb_steps, scheduler_alpha=opt.scheduler_alpha,
                alpha_param=opt.scheduler_param, scheduler_gamma=opt.scheduler_gamma,
                gamma_params=tuple(float(v) for v in sp), two_head=tcfg.two_head,
                collect_frames=True,
            )
            return jax.block_until_ready(s), f

        t0 = time.time()
        if opt.profile_dir and not times:  # trace the first executed batch
            from bndm_tpu.utils.timing import profile_trace

            with profile_trace(opt.profile_dir):
                sample, frames = _run()
        else:
            sample, frames = _run()
        times.append(time.time() - t0)

        to_save = np.asarray(sample) if opt.save_all_samples else np.asarray(sample[:1])
        img_path = os.path.join(out_dir, fname, "images", f"{i:05d}_{{0}}.png")
        if writer is not None:
            writer.submit(to_save, img_path)
        else:
            save_image_grid(to_save, img_path)
        if frames is not None:
            for j, fr in enumerate(np.asarray(frames)):
                save_image_grid(fr, os.path.join(
                    out_dir, fname, "seqs",
                    f"{noise_folder_name(opt.noise_type)}_img{cnt:05d}_step{j}_{{0}}.png"))
        cnt += bs
        print(f"batch {i}: {bs} samples in {times[-1]:.2f}s "
              f"({bs/times[-1]:.1f} samples/s)")
    if writer is not None:
        t_drain = time.time()
        written = writer.close()
        wall = time.time() - wall_t0
        print(f"gallery: {written} images written "
              f"(final encode drain {time.time() - t_drain:.1f}s)")
        if written:
            # end-to-end number incl. host fetch + PNG encode + disk
            # (device-only throughput is the per-batch prints above)
            print(f"end-to-end gallery throughput incl. I/O: "
                  f"{written / wall:.2f} samples/s over {wall:.1f}s wall")
    if times:
        print("mean batch sampling time (excl. first/compile):",
              np.mean(times[1:]) if len(times) > 1 else times[0])
    return out_dir


def run_superres_test(opt):
    """Conditional super-res eval (reference iadb_bn.py:566-682): for each
    test image, condition on the bilinear down-x4-up image, initialize x0
    with the blue-noise mix (:630-633 — unlike the unconditional path, the
    conditional one DOES blue-initialize), sample, report SSIM/PSNR/L2/L1."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import (load_pixel_unet_params,
                                     noise_folder_name, save_image_grid,
                                     serving_relax_kw)
    from bndm_tpu.data.imagefolder import ImageFolderDataset
    from bndm_tpu.ops.noise import get_noise
    from bndm_tpu.ops.schedules import gamma_schedule
    from bndm_tpu.samplers.iadb import sample_iadb
    from bndm_tpu.utils.image import superres_condition
    from bndm_tpu.utils.metrics import psnr, ssim

    model, tcfg, L, out_dir = build(opt)
    L = jnp.asarray(L)
    fname = f"{opt.dataset}_iadb_{noise_folder_name(opt.noise_type)}_{opt.conditional_type}_steps{opt.nb_steps}"
    for sub in ("images", "seqs", "lowres", "highres"):
        os.makedirs(os.path.join(out_dir, fname, sub), exist_ok=True)

    params = load_pixel_unet_params(out_dir)
    if opt.optimize_scheduler_param:
        sp = np.loadtxt(os.path.join(out_dir, "scheduler_params.txt")).astype(np.float32)
    else:
        sp = np.array([opt.scheduler_param, opt.scheduler_param_s, opt.scheduler_param_e],
                      np.float32)

    ds = ImageFolderDataset(os.path.join(opt.data_root, opt.dataset + "_test"), opt.res,
                            random_flip=False)
    # paper indices (iadb_bn.py:618-621); fall back to all for small sets
    wanted = [73, 103, 277, 388]
    indices = [i for i in wanted if i < len(ds)] or list(range(min(len(ds), 4)))

    key = jax.random.PRNGKey(opt.seed)

    # serving tiers (r4): the conditional path supports int8-static /
    # static-GN too — calibrate_sampling threads the concat([x, x_c], 1)
    # conditioning through the calibration trajectory (ops/int8.py)
    if opt.static_gn and opt.scheduler_alpha != "linear":
        raise SystemExit("--static_gn requires the linear alpha schedule")
    from bndm_tpu.serving import serving_model_pair

    m_cal, model = serving_model_pair(
        model.cfg, int8_static=opt.conv_int8 and opt.int8_mode == "static",
        static_gn=opt.static_gn, gn_steps=opt.nb_steps,
        relax_kw=serving_relax_kw(opt))
    if m_cal is not None:
        from bndm_tpu.ops.int8 import calibrate_sampling

        ckey = jax.random.fold_in(jax.random.PRNGKey(opt.seed), 777)
        cb = min(8, len(indices))
        x1_cal = jnp.stack([jnp.asarray(ds.get(i)) for i in indices[:cb]]) * 2.0 - 1.0
        x_c_cal = superres_condition(x1_cal, downscale=4)
        x_cal = jax.random.normal(ckey, x1_cal.shape, jnp.float32)
        t0 = time.time()
        quant = calibrate_sampling(
            m_cal, params, x_cal, opt.nb_steps,
            scheduler_alpha=opt.scheduler_alpha, alpha_param=opt.scheduler_param,
            scheduler_gamma=opt.scheduler_gamma, gamma_params=tuple(float(v) for v in sp),
            two_head=tcfg.two_head, x_c=x_c_cal)
        params = {"params": params.get("params", params), "quant": quant}
        print(f"serving calibration: {time.time()-t0:.1f}s "
              f"({len(jax.tree_util.tree_leaves(quant))} calibrated sites)")
    agg = {"ssim": 0.0, "psnr": 0.0, "l2": 0.0, "l1": 0.0}
    for n_done, i in enumerate(indices):
        x1 = jnp.asarray(ds.get(i))[None] * 2.0 - 1.0
        x_c = superres_condition(x1, downscale=4)
        x0 = jax.random.normal(jax.random.fold_in(key, i), x1.shape, jnp.float32)
        t = jnp.full((1,), float(opt.nb_steps))
        g = gamma_schedule(t, opt.nb_steps, opt.scheduler_gamma, sp)
        # inplace consumes x0 as the white-noise source; 'uniform' always
        # draws fresh and needs a key (ops/noise.py) — fold distinctly from
        # the x0 draw so the streams never collide
        x0 = get_noise(x0, L, g, noise_type=opt.noise_type, train=False,
                       inplace=True,
                       key=jax.random.fold_in(key, 10_000 + i)).noise

        if opt.cache_interval and opt.cache_interval > 1:
            # feature-reuse serving tier (r4: the cached chain threads x_c
            # through full AND shallow forwards); frames are serving-skipped
            from bndm_tpu.samplers.iadb import sample_iadb_cached

            def _full(p, x, t):
                return model.apply(p, x, t, return_deep=True)

            def _shallow(p, x, t, deep):
                return model.apply(p, x, t, deep_feature=deep)

            sample = sample_iadb_cached(
                _full, _shallow, params, x0,
                nb_steps=opt.nb_steps, cache_interval=opt.cache_interval,
                scheduler_alpha=opt.scheduler_alpha,
                alpha_param=opt.scheduler_param,
                scheduler_gamma=opt.scheduler_gamma,
                gamma_params=tuple(float(v) for v in sp), two_head=tcfg.two_head,
                x_c=x_c)
        else:
            sample, frames = sample_iadb(
                model.apply, params, x0,
                nb_steps=opt.nb_steps, scheduler_alpha=opt.scheduler_alpha,
                alpha_param=opt.scheduler_param, scheduler_gamma=opt.scheduler_gamma,
                gamma_params=tuple(float(v) for v in sp), two_head=tcfg.two_head,
                x_c=x_c, collect_frames=True,
            )
        s01 = jnp.clip((sample + 1) / 2, 0, 1)
        x01 = (x1 + 1) / 2
        agg["ssim"] += float(ssim(s01, x01)[0])
        agg["psnr"] += float(psnr(s01, x01)[0])
        agg["l2"] += float(jnp.sum((sample - x1) ** 2))
        agg["l1"] += float(jnp.sum(jnp.abs(sample - x1)))
        save_image_grid(np.asarray(sample), os.path.join(
            out_dir, fname, "images", f"image_{noise_folder_name(opt.noise_type)}_{i:05d}_{{0}}.png"))
        save_image_grid(np.asarray(x_c), os.path.join(
            out_dir, fname, "lowres", f"lowres_{i:05d}_{{0}}.png"))
        save_image_grid(np.asarray(x1), os.path.join(
            out_dir, fname, "highres", f"highres_{i:05d}_{{0}}.png"))
    n = max(len(indices), 1)
    print("conditional metrics: ssim: {:.4f}, psnr: {:.4f}, l2: {:.4f}, l1: {:.4f}".format(
        agg["ssim"] / n, agg["psnr"] / n, agg["l2"] / n, agg["l1"] / n))
    return out_dir


def main(argv=None):
    opt = parse_args(argv)
    if opt.coordinator_address or (opt.num_processes or 0) > 1:
        from bndm_tpu.parallel.distributed import init_distributed

        init_distributed(opt.coordinator_address, opt.num_processes,
                         opt.process_id)
    np.random.seed(opt.seed)
    if opt.train_or_test == "train":
        run_train(opt)
    elif opt.is_conditional:
        run_superres_test(opt)
    else:
        run_test(opt)


if __name__ == "__main__":
    main()
