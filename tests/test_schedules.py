import numpy as np
import jax.numpy as jnp

from bndm_tpu.ops.schedules import alpha_schedule, gamma_schedule, gamma_param_ranges


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_gamma_sigmoid(t, T, tau, s, e):
    """Independent numpy oracle for the reference's sigmoid gamma
    (iadb_bn.py:167-178): normalized reversed sigmoid, clipped, flipped."""
    v_s, v_e = _np_sigmoid(s / tau), _np_sigmoid(e / tau)
    out = _np_sigmoid(((t / T) * (e - s) + s) / tau)
    out = np.clip((v_e - out) / (v_e - v_s), 1e-9, 1.0)
    return 1.0 - out


def test_linear_is_t_over_T():
    t = jnp.arange(0, 1001, dtype=jnp.float32)
    np.testing.assert_allclose(alpha_schedule(t, 1000, "linear"), t / 1000.0)
    np.testing.assert_allclose(gamma_schedule(t, 1000, "linear"), t / 1000.0)


def test_gamma_sigmoid_matches_oracle():
    t = np.linspace(0, 1000, 97).astype(np.float32)
    for tau, s, e in [(0.2, 0.0, 3.0), (1000.0, 0.0, 3.0), (0.5, -1.0, 2.0)]:
        got = np.asarray(gamma_schedule(t, 1000, "sigmoid", (tau, s, e)))
        want = _np_gamma_sigmoid(t, 1000.0, tau, s, e)
        # fp32 implementation vs fp64 oracle
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_gamma_sigmoid_tau1000_is_nearly_linear():
    # the paper's fig-inset observation: tau=1000 makes sigmoid ~ linear
    t = np.linspace(0, 1000, 101).astype(np.float32)
    got = np.asarray(gamma_schedule(t, 1000, "sigmoid", (1000.0, 0.0, 3.0)))
    np.testing.assert_allclose(got, t / 1000.0, atol=5e-3)


def test_gamma_endpoints_and_monotonicity():
    t = np.linspace(0, 1000, 256).astype(np.float32)
    for kind, params in [
        ("sigmoid", (0.2, 0.0, 3.0)),
        ("cosine", (1.0, 0.0, 1.0)),
        ("linear", (1.0, 1.0, 1.0)),
    ]:
        g = np.asarray(gamma_schedule(t, 1000, kind, params))
        assert g[0] <= 1e-6 + 1e-9
        assert g[-1] >= 1.0 - 1e-5
        assert np.all(np.diff(g) >= -1e-6), kind


def test_gamma_is_differentiable_wrt_params():
    import jax

    def f(params):
        return jnp.sum(gamma_schedule(jnp.arange(1000.0), 1000, "sigmoid", params))

    g = jax.grad(f)(jnp.array([0.5, -1.0, 2.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.abs(np.asarray(g)) > 0)


def test_alpha_sigmoid_uses_fixed_constants():
    # reference alpha-sigmoid: start=param, end=3, tau=0.9 (iadb_bn.py:115-122)
    t = np.linspace(0, 1000, 64).astype(np.float32)
    got = np.asarray(alpha_schedule(t, 1000, "sigmoid", param=0.02))
    want = 1.0 - np.clip(
        (_np_sigmoid(3 / 0.9) - _np_sigmoid(((t / 1000) * (3 - 0.02) + 0.02) / 0.9))
        / (_np_sigmoid(3 / 0.9) - _np_sigmoid(0.02 / 0.9)),
        1e-9,
        1.0,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_param_ranges():
    assert gamma_param_ranges("sigmoid", optimize=True) == (
        (0.01, 10.0),
        (-3.0, -0.01),
        (0.01, 3.0),
    )
    assert gamma_param_ranges("sigmoid", optimize=False, defaults=(0.2, 0.0, 3.0)) == (
        (0.2, 0.2),
        (0.0, 0.0),
        (3.0, 3.0),
    )
