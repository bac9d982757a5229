"""DDIM baseline pipeline CLI — flag-compatible with reference ddim_diffusers.py.

Train: DDPM objective (epsilon/sample prediction) on ImageFolder data with
EMA and HF LR schedules. Test: 250-step DDIM sampling as one jitted scan,
with the reference's saved-noise replicability hook and seqs/images output
naming (ddim_diffusers.py:624-712).

Usage mirrors the reference scripts, e.g.:
  python -m bndm_tpu.cli.ddim --dataset_name=cat_res64 --resolution=64 \
      --train_or_test=test --eval_batch_size=500 --test_samples=30000 \
      --output_dir=ddim_cat_res64 ...
"""

from __future__ import annotations

import os
import time

import numpy as np


def model_config(args):
    from bndm_tpu.models.unet2d import UNet2DConfig, unet_config_for_res

    if args.tiny_model:
        return UNet2DConfig(
            in_channels=3, out_channels=3, block_out_channels=(8, 16),
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            attention_head_dim=4, norm_num_groups=4, dtype=args.compute_dtype,
            conv_int8=args.conv_int8,
        )
    if args.resolution in (64, 128):
        return unet_config_for_res(args.resolution, 3, 3, dtype=args.compute_dtype,
                                   conv_int8=args.conv_int8)
    if args.resolution == 256:
        # ddim's res-256 config is the 7-block layout (ddim_diffusers.py:428-453)
        cfg = unet_config_for_res(128, 3, 3, dtype=args.compute_dtype,
                                  conv_int8=args.conv_int8)
        return cfg
    raise NotImplementedError(f"resolution {args.resolution}")


def out_dir_for(args):
    name = args.output_dir + ("_ema" if args.use_ema else "")
    return os.path.join("results_gaussianBN", name)


def run_train(args):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import save_params
    from bndm_tpu.data.imagefolder import BatchLoader, ImageFolderDataset
    from bndm_tpu.models.unet2d import UNet2D
    from bndm_tpu.parallel.distributed import host_shard_info
    from bndm_tpu.parallel.mesh import auto_mesh, replicate, shard_host_local_batch
    from bndm_tpu.train.ddim import DDIMTrainConfig, make_ddim_train_step
    from bndm_tpu.train.schedules_lr import hf_adamw

    out_dir = out_dir_for(args)
    os.makedirs(out_dir, exist_ok=True)
    model = UNet2D(model_config(args))
    # HF train_unconditional crop semantics: CenterCrop only with
    # --center_crop, RandomCrop otherwise (reference ddim_diffusers.py:539)
    ds = ImageFolderDataset(os.path.join(args.data_root, args.dataset_name),
                            args.resolution, random_flip=args.random_flip,
                            seed=args.seed, random_crop=not args.center_crop)
    # each host loads its slice of the global batch (no-op single-host)
    shard_index, shard_count = host_shard_info()
    if args.train_batch_size % shard_count:
        raise ValueError(f"--train_batch_size={args.train_batch_size} must "
                         f"divide across {shard_count} processes")
    loader = BatchLoader(ds, args.train_batch_size // shard_count, seed=args.seed,
                         num_threads=args.dataloader_num_workers or 8,
                         shard_index=shard_index, shard_count=shard_count)
    is_main = shard_index == 0
    steps_total = max(len(loader), 1) * args.num_epochs

    cfg = DDIMTrainConfig(
        ddpm_num_steps=args.ddpm_num_steps,
        ddpm_beta_schedule=args.ddpm_beta_schedule,
        prediction_type=args.prediction_type,
        use_ema=args.use_ema,
        ema_inv_gamma=args.ema_inv_gamma,
        ema_power=args.ema_power,
        ema_max_decay=args.ema_max_decay,
    )
    optimizer = hf_adamw(args, steps_total)
    train_step, init_state = make_ddim_train_step(model.apply, cfg, optimizer)

    from bndm_tpu.ckpt.manager import CheckpointManager
    from bndm_tpu.utils.logging import MetricLogger, save_loss_curve

    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, jnp.zeros((1, 3, args.resolution, args.resolution)),
                        jnp.zeros((1,)))
    state = init_state(params)
    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"),
                            max_to_keep=args.checkpoints_total_limit or 3)
    step = 0
    if args.resume_from_checkpoint:  # "latest" or a step number
        want = None if args.resume_from_checkpoint == "latest" else int(
            args.resume_from_checkpoint.split("-")[-1])
        restored = mgr.restore(state, step=want)
        if restored is not None:
            state = restored
            step = int(np.asarray(state.step))
            print(f"Resuming from checkpoint step {step}")
        else:
            print(f"Checkpoint '{args.resume_from_checkpoint}' does not exist. "
                  "Starting a new training run.")
    mesh = auto_mesh(args.train_batch_size)
    state = replicate(mesh, state)
    logger = MetricLogger(os.path.join(out_dir, args.logging_dir)) if is_main else None

    losses = []
    for epoch in range(args.num_epochs):
        epoch_metrics = []  # device scalars; fetched once per epoch
        for batch in loader.epoch(epoch):
            state, m = train_step(state, shard_host_local_batch(mesh, np.asarray(batch)),
                                  jax.random.fold_in(key, step))
            epoch_metrics.append(m["loss"])
            step += 1
            if step % args.checkpointing_steps == 0:
                mgr.save(step, state)
            if args.max_steps and step >= args.max_steps:
                break
        for off, l in enumerate(epoch_metrics):
            losses.append(float(l))
            if logger is not None:
                logger.log({"loss": losses[-1]}, step - len(epoch_metrics) + off)
        print(f"epoch {epoch}: mean loss {np.mean(losses[-max(len(loader),1):]):.5f}")
        if is_main and (epoch % args.save_model_epochs == 0 or epoch == args.num_epochs - 1):
            # with --use_ema the reference copies the EMA params into the saved
            # unet/ before save_pretrained (ddim_diffusers.py:869-885), so eval
            # sees EMA weights; raw weights stay in the Orbax checkpoints
            eval_params = state.ema.params if state.ema is not None else state.params
            save_params(os.path.join(out_dir, "unet", "model.npz"), eval_params)
            if state.ema is not None:
                save_params(os.path.join(out_dir, "unet_ema", "model.npz"),
                            state.ema.params)
            from bndm_tpu.models.convert import (ddim_scheduler_config,
                                                 export_pipeline_tree)

            export_pipeline_tree(
                out_dir, jax.device_get(eval_params), model.cfg, args.resolution,
                ddim_scheduler_config(args.ddpm_num_steps, args.ddpm_beta_schedule,
                                      args.prediction_type),
                pipeline_class="DDIMPipeline")
            np.savetxt(os.path.join(out_dir, "losses.txt"), np.asarray(losses))
            save_loss_curve(losses, os.path.join(out_dir, "losses.png"))
        if args.max_steps and step >= args.max_steps:
            break
    mgr.save(step, state)
    mgr.wait()
    mgr.close()
    if logger is not None:
        logger.close()
    return out_dir


def run_test(args):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import load_tree_unet_params, save_image_grid, serving_relax_kw
    from bndm_tpu.models.unet2d import UNet2D
    from bndm_tpu.parallel.mesh import auto_mesh, replicate, shard_batch
    from bndm_tpu.samplers.ddim import (DDIMScheduler, sample_ddim,
                                        sample_ddim_cached)

    out_dir = out_dir_for(args)
    for sub in ("images", "seqs"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    # from_pretrained semantics (ddim_diffusers.py:640-643): the published
    # tree's config.json/scheduler_config.json win over CLI flags
    params, tree_cfg = load_tree_unet_params(out_dir)
    if tree_cfg is not None and not args.tiny_model:
        import dataclasses

        cfg = dataclasses.replace(tree_cfg, dtype=args.compute_dtype,
                                  conv_int8=args.conv_int8)
    else:
        cfg = model_config(args)
    model = UNet2D(cfg)
    sched_cfg_path = os.path.join(out_dir, "scheduler", "scheduler_config.json")
    if os.path.exists(sched_cfg_path):
        import json

        with open(sched_cfg_path) as f:
            scheduler = DDIMScheduler.from_config(json.load(f))
    else:
        scheduler = DDIMScheduler(
            num_train_timesteps=args.ddpm_num_steps,
            beta_schedule=args.ddpm_beta_schedule,
            prediction_type=args.prediction_type,
        )

    # serving calibration (same scheme as the IADB CLIs): one exact
    # small-batch DDIM trajectory records constant int8 activation
    # scales and/or per-(site, step) GroupNorm statistics; sampling then
    # runs W8A8 with static scales / one-FMA static GN. DDIM's GN tables
    # are keyed on scan position (pass_step_idx below) since its integer
    # timesteps carry no index (ops/static_norm.py)
    from bndm_tpu.serving import serving_model_pair

    if args.cache_interval and args.cache_depth != 1:
        import dataclasses

        model = UNet2D(dataclasses.replace(model.cfg,
                                           cache_depth=args.cache_depth))
    m_cal, model = serving_model_pair(
        model.cfg, int8_static=args.conv_int8 and args.int8_mode == "static",
        static_gn=args.static_gn, gn_steps=args.ddpm_num_inference_steps,
        relax_kw=serving_relax_kw(args))
    if m_cal is not None:
        from bndm_tpu.ops.int8 import calibrate_sampling_ddim

        ckey = jax.random.fold_in(jax.random.PRNGKey(args.seed), 777)
        x_cal = jax.random.normal(
            ckey, (min(8, args.eval_batch_size), 3, args.resolution,
                   args.resolution), jnp.float32)
        t0 = time.time()
        quant = calibrate_sampling_ddim(m_cal, params, x_cal, scheduler,
                                        args.ddpm_num_inference_steps)
        params = {"params": params.get("params", params), "quant": quant}
        print(f"serving calibration: {time.time()-t0:.1f}s "
              f"({len(jax.tree_util.tree_leaves(quant))} calibrated sites)")

    mesh = auto_mesh(args.eval_batch_size)
    params = replicate(mesh, params)
    key = jax.random.PRNGKey(args.seed)
    num_batch = max(args.test_samples // args.eval_batch_size, 1)
    cnt = 0
    times = []
    # paper-replicability batch filter (ddim_diffusers.py:656-665)
    replicability_batches = {
        "cat_res64": [4], "cat_res128": [0, 52], "celeba_res64": [37],
        "celeba_res128": [10, 26], "church_res64": [4, 23, 32, 36],
    }.get(args.dataset_name)
    for i in range(num_batch):
        if replicability_batches is not None and i not in replicability_batches:
            continue
        # saved-noise replicability hook (ddim_diffusers.py:667-669)
        noise_path = os.path.join(
            "results_gaussianBN",
            f"{args.dataset_name}_gaussian_linear_outc3_seed0",
            f"{args.dataset_name}_iadb_gwn_steps250", "noise",
            f"noise_batch{args.eval_batch_size}_idx{i:05d}.npz",
        )
        if os.path.exists(noise_path):
            x0 = jnp.asarray(np.load(noise_path)["noise"], jnp.float32)
            x0 = x0[0:1]  # "replicability, only one sample" (ddim_diffusers.py:670)
        else:
            x0 = jax.random.normal(
                jax.random.fold_in(key, i),
                (args.eval_batch_size, 3, args.resolution, args.resolution), jnp.float32)

        if x0.shape[0] % mesh.devices.size == 0:
            x0 = shard_batch(mesh, x0)

        def _run():
            if args.cache_interval:
                # feature-reuse serving tier (samplers/ddim.py
                # sample_ddim_cached): serving-only, seqs/ frames skipped
                def apply_full(p, x, t, step_idx=None):
                    return model.apply(p, x, t, step_idx=step_idx,
                                       return_deep=True)

                def apply_shallow(p, x, t, deep, step_idx=None):
                    return model.apply(p, x, t, step_idx=step_idx,
                                       deep_feature=deep)

                o = sample_ddim_cached(
                    apply_full, apply_shallow, params, x0,
                    scheduler=scheduler,
                    num_inference_steps=args.ddpm_num_inference_steps,
                    cache_interval=args.cache_interval,
                    pass_step_idx=bool(args.static_gn))
                return jax.block_until_ready(o), None
            o, f = sample_ddim(model.apply, params, x0, scheduler=scheduler,
                               num_inference_steps=args.ddpm_num_inference_steps,
                               collect_frames=True,
                               pass_step_idx=bool(args.static_gn))
            return jax.block_until_ready(o), f

        t0 = time.time()
        if args.profile_dir and not times:  # trace the first executed batch
            from bndm_tpu.utils.timing import profile_trace

            with profile_trace(args.profile_dir):
                out, frames = _run()
        else:
            out, frames = _run()
        times.append(time.time() - t0)
        save_image_grid(np.asarray(out),
                        os.path.join(out_dir, "images", f"ddim_img{cnt:05d}_{{0}}.png"))
        if frames is not None:
            for j, fr in enumerate(np.asarray(frames)):
                save_image_grid(fr, os.path.join(out_dir, "seqs",
                                                 f"ddim_img{cnt:05d}_step{j * 25}_{{0}}.png"))
        cnt += x0.shape[0]
        print(f"batch {i}: {x0.shape[0]} samples in {times[-1]:.2f}s")
    return out_dir


def main(argv=None):
    from bndm_tpu.cli.hf_args import parse_args

    args = parse_args(argv)
    if args.coordinator_address or (args.num_processes or 0) > 1:
        from bndm_tpu.parallel.distributed import init_distributed

        init_distributed(args.coordinator_address, args.num_processes,
                         args.process_id)
    np.random.seed(args.seed)
    if args.train_or_test == "train":
        run_train(args)
    else:
        run_test(args)


if __name__ == "__main__":
    main()
