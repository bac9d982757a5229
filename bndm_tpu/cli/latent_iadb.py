"""Latent IADB/BNDM pipeline CLI — flag-compatible with the reference.

TPU-native counterpart of ``latent_iadb_bn_diffusers.py``: VAE-encode
512^2/256^2 images once into the memmap latent cache (x2 via hflip —
reference images_to_latents, latent_...:194-222), train the latent UNet with
the linear alpha=gamma IADB objective, sample with the jitted scan and
VAE-decode at t=0 (:524-534).

Usage mirrors the reference accelerate scripts, e.g.:
  python -m bndm_tpu.cli.latent_iadb --dataset_name=cat_res512 --resolution=512 \
      --random_flip --output_dir=latent_iadb_cat_res512 --train_batch_size=256 \
      --learning_rate=1e-4 --out_channels=4 --num_epochs=1000 --noise_type=gaussianBN
"""

from __future__ import annotations

import os
import time

import numpy as np


def latent_unet_config(args, out_channels):
    from bndm_tpu.models.unet2d import UNet2DConfig, unet_config_for_res

    if args.tiny_model:
        return UNet2DConfig(
            in_channels=4, out_channels=out_channels, block_out_channels=(8, 16),
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            attention_head_dim=4, norm_num_groups=4, dtype=args.compute_dtype,
            conv_int8=args.conv_int8,
        )
    # reference latent_...:337-359: config keyed on PIXEL resolution
    if args.resolution in (64, 512):
        return unet_config_for_res(64, 4, out_channels, dtype=args.compute_dtype,
                                   conv_int8=args.conv_int8)
    if args.resolution == 128:
        return unet_config_for_res(128, 4, out_channels, dtype=args.compute_dtype,
                                   conv_int8=args.conv_int8)
    if args.resolution == 256:
        return unet_config_for_res("latent32", 4, out_channels, dtype=args.compute_dtype,
                                   conv_int8=args.conv_int8)
    raise NotImplementedError(f"resolution {args.resolution}")


def out_dir_for(args):
    name = args.output_dir + f"_{args.noise_type}" + ("_ema" if args.use_ema else "")
    return os.path.join("results_gaussianBN", name)


def get_vae(args):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import load_params
    from bndm_tpu.models.vae import AutoencoderKL, VAEConfig

    if args.tiny_model:
        # still /8 like the SD VAE (4 blocks, 3 downsamples), but tiny
        vcfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                         norm_num_groups=4, dtype=args.compute_dtype)
    else:
        vcfg = VAEConfig(dtype=args.compute_dtype)
    vae = AutoencoderKL(vcfg)
    if args.vae_params and os.path.exists(args.vae_params):
        if args.vae_params.endswith((".safetensors", ".ckpt", ".pt", ".bin")):
            from bndm_tpu.models.convert import load_reference_unet

            params = load_reference_unet(args.vae_params)
        else:
            params = load_params(args.vae_params)
    else:
        print("WARNING: no --vae_params given; using random-init VAE "
              "(fine for smoke tests, not for real latents)")
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))
    return vae, params


def build_latent_cache(args, vae, vae_params):
    """VAE-encode the ImageFolder once (x2 hflip) into the memmap cache."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.data.imagefolder import ImageFolderDataset
    from bndm_tpu.data.latent_cache import LatentCacheWriter
    from bndm_tpu.models.vae import AutoencoderKL

    cache_path = os.path.join(args.data_root, f"{args.dataset_name}_latent_cache")
    if os.path.exists(os.path.join(cache_path, "meta.json")):
        return cache_path
    if jax.process_index() != 0:
        # multi-host: process 0 builds the cache; the rest wait for it
        # (shared filesystem assumed, like the reference's LMDB dir)
        while not os.path.exists(os.path.join(cache_path, "meta.json")):
            time.sleep(5)
        return cache_path
    ds = ImageFolderDataset(os.path.join(args.data_root, args.dataset_name),
                            args.resolution, random_flip=False)
    lat_res = args.resolution // 8
    writer = LatentCacheWriter(cache_path, (4, lat_res, lat_res))
    encode = jax.jit(lambda p, x, k: vae.apply(p, x, k, method=AutoencoderKL.encode))
    key = jax.random.PRNGKey(args.seed)
    for i in range(len(ds)):
        img = ds.get(i)[None] * 2.0 - 1.0
        for f in range(2):  # original + hflip (latent_...:207-221)
            x = jnp.asarray(img if f == 0 else img[..., ::-1])
            z = encode(vae_params, x, jax.random.fold_in(key, i * 2 + f))
            writer.add(np.asarray(z[0], np.float16))
    n = writer.finalize()
    print(f"latent cache built: {n} latents at {cache_path}")
    return cache_path


def run_train(args):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import save_params
    from bndm_tpu.data.latent_cache import LatentCacheDataset
    from bndm_tpu.models.unet2d import UNet2D
    from bndm_tpu.parallel.distributed import host_shard_info
    from bndm_tpu.parallel.mesh import auto_mesh, replicate, shard_host_local_batch
    from bndm_tpu.train.latent import LatentTrainConfig, make_latent_train_step
    from bndm_tpu.train.schedules_lr import hf_adamw
    from bndm_tpu.cli.common import load_L_for

    out_dir = out_dir_for(args)
    os.makedirs(out_dir, exist_ok=True)

    out_channels = args.out_channels
    if args.noise_type in ("gaussianBN", "gaussianRN"):
        out_channels *= 2  # latent_...:282-283

    vae, vae_params = get_vae(args)
    cache = build_latent_cache(args, vae, vae_params)
    ds = LatentCacheDataset(cache)
    model = UNet2D(latent_unet_config(args, out_channels))
    L = jnp.asarray(load_L_for(args.noise_type, args.bluenoise_dir))

    nb = max(len(ds) // args.train_batch_size, 1)
    cfg = LatentTrainConfig(
        ddpm_num_steps=args.ddpm_num_steps, noise_type=args.noise_type,
        out_channels=out_channels, use_ema=args.use_ema,
        ema_inv_gamma=args.ema_inv_gamma, ema_power=args.ema_power,
        ema_max_decay=args.ema_max_decay,
    )
    optimizer = hf_adamw(args, nb * args.num_epochs)
    train_step, init_state = make_latent_train_step(model.apply, cfg, L, optimizer)

    from bndm_tpu.ckpt.manager import CheckpointManager
    from bndm_tpu.utils.logging import MetricLogger, save_loss_curve

    key = jax.random.PRNGKey(args.seed)
    lat_res = args.resolution // 8
    params = model.init(key, jnp.zeros((1, 4, lat_res, lat_res)), jnp.zeros((1,)))
    state = init_state(params)
    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"),
                            max_to_keep=args.checkpoints_total_limit or 3)
    step = 0
    if args.resume_from_checkpoint:
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
    # each host trains on its slice of the global batch (no-op single-host)
    shard_index, shard_count = host_shard_info()
    if args.train_batch_size % shard_count:
        raise ValueError(f"--train_batch_size={args.train_batch_size} must "
                         f"divide across {shard_count} processes")
    is_main = shard_index == 0
    logger = MetricLogger(os.path.join(out_dir, args.logging_dir)) if is_main else None

    losses = []
    for epoch in range(args.num_epochs):
        epoch_metrics = []  # device scalars; fetched once per epoch
        for batch in ds.batches(args.train_batch_size // shard_count,
                                seed=(args.seed, epoch),
                                shard_index=shard_index, shard_count=shard_count):
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
        print(f"epoch {epoch}: mean loss {np.mean(losses[-nb:]):.2f}")
        if is_main and (epoch % args.save_model_epochs == 0 or epoch == args.num_epochs - 1):
            # EMA-at-eval parity: reference copies EMA params into the saved
            # unet/ before IADBPipeline.save_pretrained (latent_...:680-688)
            eval_params = state.ema.params if state.ema is not None else state.params
            save_params(os.path.join(out_dir, "unet", "model.npz"), eval_params)
            if state.ema is not None:
                save_params(os.path.join(out_dir, "unet_ema", "model.npz"), state.ema.params)
            from bndm_tpu.models.convert import (export_pipeline_tree,
                                                 iadb_scheduler_config)

            export_pipeline_tree(
                out_dir, jax.device_get(eval_params), model.cfg, lat_res,
                iadb_scheduler_config(args.ddpm_num_steps),
                pipeline_class="IADBPipeline")
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
    from bndm_tpu.samplers.iadb import sample_iadb

    out_dir = out_dir_for(args)
    for sub in ("images", "seqs"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    out_channels = args.out_channels
    if args.noise_type in ("gaussianBN", "gaussianRN"):
        out_channels *= 2
    # from_pretrained semantics: a published save_pretrained tree (unet/
    # config.json + safetensors) loads unchanged; unet/model.npz stays the
    # fast path for bndm-tpu-trained runs
    params, tree_cfg = load_tree_unet_params(out_dir)
    if tree_cfg is not None and not args.tiny_model:
        import dataclasses

        cfg = dataclasses.replace(tree_cfg, dtype=args.compute_dtype,
                                  conv_int8=args.conv_int8)
        out_channels = cfg.out_channels
    else:
        cfg = latent_unet_config(args, out_channels)
    if args.cache_depth != 1:
        import dataclasses

        cfg = dataclasses.replace(cfg, cache_depth=args.cache_depth)
    model = UNet2D(cfg)
    vae, vae_params = get_vae(args)
    two_head = args.noise_type in ("gaussianBN", "gaussianRN") and out_channels == 8

    from bndm_tpu.models.vae import make_decoder

    decode = make_decoder(vae, getattr(args, "decode_microbatch", 16))
    lat_res = args.resolution // 8

    # serving path (same flow as the pixel CLI): calibrate constant conv
    # activation scales and/or per-step GroupNorm statistics on one
    # exact small trajectory; the latent sampler uses linear alpha=gamma,
    # calibrate_sampling's defaults (latent_...:602-604)
    from bndm_tpu.serving import serving_model_pair

    m_cal, model = serving_model_pair(
        cfg,
        int8_static=args.conv_int8
        and getattr(args, "int8_mode", "static") == "static",
        static_gn=args.static_gn, gn_steps=args.ddpm_num_inference_steps,
        relax_kw=serving_relax_kw(args))
    if m_cal is not None:
        from bndm_tpu.ops.int8 import calibrate_sampling

        # dedicated generator: drawing from the global numpy RNG would shift
        # the sampling noise stream, breaking identical-x0 fidelity
        # comparisons between --conv_int8 and bf16 runs at the same --seed
        cal_rng = np.random.default_rng(args.seed + 777)
        x_cal = jnp.asarray(cal_rng.standard_normal(
            (min(4, args.eval_batch_size), 4, lat_res, lat_res)).astype(np.float32))
        quant = calibrate_sampling(m_cal, params, x_cal,
                                   args.ddpm_num_inference_steps, two_head=two_head)
        params = {"params": params.get("params", params), "quant": quant}
        print(f"serving calibration done "
              f"({len(jax.tree_util.tree_leaves(quant))} conv sites)")
    num_batch = max(args.test_samples // args.eval_batch_size, 1)
    cnt = 0

    # defined ONCE (not per batch): static jit args of the cached sampler —
    # fresh function objects would retrace every batch
    def apply_full(p, x, t):
        return model.apply(p, x, t, return_deep=True)

    def apply_shallow(p, x, t, deep):
        return model.apply(p, x, t, deep_feature=deep)

    save_name = {"gaussian": "iadb_gwn", "gaussianBN": "iadb_gwn2gbn",
                 "gaussianRN": "iadb_gwn2grn"}[args.noise_type]
    for i in range(num_batch):
        noise = np.random.randn(args.eval_batch_size, 4, lat_res, lat_res).astype(np.float32)
        # figure-9 noise-index selection (latent_...:505-513)
        if args.test_samples >= 100:
            if i == 0:
                noise = noise[[2, 7, 31, 48]]
            elif i == 1:
                noise = noise[[6]]
            else:
                continue
        x0 = jnp.asarray(noise)

        def _run():
            if args.cache_interval and args.cache_interval > 1:
                # feature-reuse serving tier (cf. DeepCache) — same linear
                # alpha=gamma defaults as the plain latent sampler
                from bndm_tpu.samplers.iadb import sample_iadb_cached

                z = sample_iadb_cached(
                    apply_full, apply_shallow, params, x0,
                    nb_steps=args.ddpm_num_inference_steps,
                    cache_interval=args.cache_interval, two_head=two_head)
            else:
                z, _ = sample_iadb(model.apply, params, x0,
                                   nb_steps=args.ddpm_num_inference_steps,
                                   two_head=two_head)
            return jax.block_until_ready(decode(vae_params, z))

        t0 = time.time()
        if args.profile_dir and cnt == 0:  # trace the first executed batch
            from bndm_tpu.utils.timing import profile_trace

            with profile_trace(args.profile_dir):
                imgs = _run()
        else:
            imgs = _run()
        print(f"batch {i}: {x0.shape[0]} samples in {time.time()-t0:.2f}s")
        save_image_grid(np.asarray(imgs), os.path.join(
            out_dir, "images", f"{save_name}_{cnt:05d}_{{0}}.png"))
        cnt += x0.shape[0]
    print("Done.")
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
