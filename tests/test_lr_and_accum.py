import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bndm_tpu.train.schedules_lr import hf_adamw, hf_lr_schedule


def _args(**kw):
    base = dict(lr_scheduler="cosine", learning_rate=1e-4, lr_warmup_steps=0,
                gradient_accumulation_steps=1, adam_beta1=0.95, adam_beta2=0.999,
                adam_epsilon=1e-8, adam_weight_decay=1e-6)
    base.update(kw)
    return argparse.Namespace(**base)


def test_cosine_schedule_shape():
    fn = hf_lr_schedule("cosine", 1.0, 100, 1000)
    # warmup ramp
    assert float(fn(0)) == 0.0
    assert abs(float(fn(50)) - 0.5) < 1e-6
    assert abs(float(fn(100)) - 1.0) < 1e-2
    # cosine decay to ~0
    assert float(fn(1000)) < 1e-6
    mid = float(fn(550))
    assert abs(mid - 0.5) < 0.01  # halfway: cos(pi/2) -> 0.5


def test_constant_with_warmup():
    fn = hf_lr_schedule("constant_with_warmup", 2.0, 10, 1000)
    assert abs(float(fn(5)) - 1.0) < 1e-6
    assert abs(float(fn(500)) - 2.0) < 1e-6


def test_linear_schedule():
    fn = hf_lr_schedule("linear", 1.0, 0, 100)
    assert abs(float(fn(50)) - 0.5) < 1e-6
    assert float(fn(100)) == 0.0


def test_grad_accumulation_updates_every_k():
    opt = hf_adamw(_args(gradient_accumulation_steps=4, lr_scheduler="constant"), 100)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    g = {"w": jnp.full((3,), 0.1)}
    p = params
    snapshots = []
    for i in range(8):
        updates, state = opt.update(g, state, p)
        p = optax.apply_updates(p, updates)
        snapshots.append(np.asarray(p["w"]).copy())
    # params unchanged for the first 3 micro steps, changed at the 4th
    np.testing.assert_array_equal(snapshots[0], snapshots[1])
    np.testing.assert_array_equal(snapshots[1], snapshots[2])
    assert not np.array_equal(snapshots[2], snapshots[3])
    np.testing.assert_array_equal(snapshots[3], snapshots[4])
    assert not np.array_equal(snapshots[6], snapshots[7])


def test_adamw_schedule_traceable():
    opt = hf_adamw(_args(), 100)
    params = {"w": jnp.ones(4)}

    @jax.jit
    def step(state, p):
        updates, state = opt.update({"w": jnp.full((4,), 0.5)}, state, p)
        return state, optax.apply_updates(p, updates)

    state = opt.init(params)
    state, p = step(state, params)
    assert np.all(np.isfinite(np.asarray(p["w"])))
