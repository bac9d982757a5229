"""Reference-shaped convenience API (parity with reference ``utils.py``).

The reference's ``utils.py`` re-exposes the pipeline pieces with explicit
parameters instead of a global ``opt`` (get_model :7-84, get_scheduler
:94-116, get_scheduler_gamma :120-174, sample_iadb :180-240) for the demo.
This module is the same surface for bndm-tpu users: one import with the
model factory, both schedules, the noise engine, and the jitted sampler.
"""

from __future__ import annotations

import jax.numpy as jnp

from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
from bndm_tpu.ops.noise import get_noise, get_noise_v2  # noqa: F401 (re-export)
from bndm_tpu.ops.schedules import alpha_schedule, gamma_schedule
from bndm_tpu.samplers.iadb import sample_iadb as _sample_iadb


def get_model(res=64, inp_channel=3, out_channel=3, activation="silu", dtype="bfloat16"):
    """UNet2D with the reference's per-resolution block layout
    (reference utils.py:7-84 / iadb_bn.py:205-282). Returns the flax module;
    call ``.init`` / ``.apply`` as usual."""
    return UNet2D(unet_config_for_res(res, inp_channel, out_channel,
                                      act_fn=activation, dtype=dtype))


def get_scheduler(x, scheduler, nb_steps=1000, scheduler_param=0.02):
    """alpha schedule (reference utils.py:94-116)."""
    return alpha_schedule(jnp.asarray(x), nb_steps, scheduler, scheduler_param)


def get_scheduler_gamma(x, scheduler, scheduler_params, nb_steps=1000):
    """gamma schedule with explicit (tau, s, e) (reference utils.py:120-174)."""
    return gamma_schedule(jnp.asarray(x), nb_steps, scheduler, scheduler_params)


def sample_iadb(model, params, x0, nb_step, scheduler_params=(1.0, 0.0, 3.0),
                scheduler_alpha="linear", scheduler_gamma="linear",
                noise_type="gaussian", out_channel=3, x_c=None,
                collect_frames=False, log_freq=None):
    """Explicit-parameter sampler (reference utils.py:180-240): reverse
    IADB/BNDM loop, jitted as one scan. Returns (x, frames | None)."""
    two_head = noise_type in ("gaussianBN", "gaussianRN") and out_channel == 2 * x0.shape[1]
    return _sample_iadb(
        model.apply, params, x0, nb_steps=nb_step,
        scheduler_alpha=scheduler_alpha, scheduler_gamma=scheduler_gamma,
        gamma_params=scheduler_params, two_head=two_head, x_c=x_c,
        collect_frames=collect_frames, log_freq=log_freq,
    )
