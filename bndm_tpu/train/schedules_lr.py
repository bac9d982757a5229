"""HF-diffusers learning-rate schedules on optax (traceable).

The reference uses ``diffusers.optimization.get_scheduler`` with 'cosine'
(default) or 'constant' plus linear warmup (ddim_diffusers.py:562-567,
latent_...:418-423). HF cosine: lr * 0.5*(1+cos(pi * progress)) after warmup.
Schedules are evaluated on a traced step inside jit, so everything is jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def hf_lr_schedule(kind, base_lr, num_warmup_steps, num_training_steps):
    kind = kind.lower()
    w = max(1, num_warmup_steps)

    def warmup_factor(step):
        return jnp.minimum(step / w, 1.0)

    if kind in ("constant", "constant_with_warmup"):
        def fn(step):
            step = jnp.asarray(step, jnp.float32)
            if num_warmup_steps == 0 and kind == "constant":
                return jnp.float32(base_lr)
            return base_lr * warmup_factor(step)
    elif kind == "cosine":
        def fn(step):
            step = jnp.asarray(step, jnp.float32)
            progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
            cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(progress, 0.0, 1.0))))
            return base_lr * jnp.where(step < num_warmup_steps, warmup_factor(step), cos)
    elif kind == "linear":
        def fn(step):
            step = jnp.asarray(step, jnp.float32)
            lin = jnp.maximum(
                0.0,
                (num_training_steps - step) / max(1, num_training_steps - num_warmup_steps),
            )
            return base_lr * jnp.where(step < num_warmup_steps, warmup_factor(step), lin)
    else:
        raise NotImplementedError(kind)
    return fn


def hf_adamw(args, num_training_steps):
    """AdamW with the reference's betas/eps/weight-decay + LR schedule +
    the fixed grad-clip 1.0 the accelerate loops apply (ddim :773, latent :643).

    ``gradient_accumulation_steps > 1`` wraps the optimizer in
    optax.MultiSteps — the TPU-native replacement for
    ``accelerator.accumulate(model)`` (ddim_diffusers.py:754, flag :152-157).
    ``num_training_steps`` is in micro-batches, matching the reference.
    """
    accum = max(1, args.gradient_accumulation_steps)
    # MultiSteps' inner optimizer sees UPDATE counts, so scale to updates
    sched = hf_lr_schedule(args.lr_scheduler, args.learning_rate,
                           args.lr_warmup_steps,
                           max(1, num_training_steps // accum))
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            learning_rate=sched,
            b1=args.adam_beta1,
            b2=args.adam_beta2,
            eps=args.adam_epsilon,
            weight_decay=args.adam_weight_decay,
        ),
    )
    if accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt
