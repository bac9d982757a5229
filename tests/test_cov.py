import numpy as np

from bndm_tpu.ops.cov import make_cov_L, load_cov_L, radial_spectrum_profile


def _radial_power(field):
    """Mean |FFT|^2 binned by radial frequency (DC excluded)."""
    f = np.fft.fft2(field)
    p = np.abs(f) ** 2
    res = field.shape[-1]
    fr = np.fft.fftfreq(res)
    fx, fy = np.meshgrid(fr, fr, indexing="ij")
    r = np.sqrt(fx**2 + fy**2)
    bins = np.linspace(0, r.max(), 9)
    prof = []
    for lo, hi in zip(bins[:-1], bins[1:]):
        m = (r > lo) & (r <= hi)
        if m.any():
            prof.append(p[..., m].mean())
    return np.array(prof)


def test_L_is_lower_triangular_unit_variance():
    res = 16
    L = make_cov_L(res=res, kind="blue")
    n = res * res
    assert L.shape == (n, n)
    assert np.allclose(L, np.tril(L))
    # C = L L^T must have ~unit diagonal
    diag = np.einsum("ij,ij->i", L, L)
    np.testing.assert_allclose(diag, 1.0, atol=1e-3)


def test_blue_spectrum_rises_red_falls():
    res = 32
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, res * res)).astype(np.float32)
    for kind, rising in [("blue", True), ("red", False)]:
        L = make_cov_L(res=res, kind=kind)
        fields = (w @ L.T).reshape(64, res, res)
        prof = _radial_power(fields)
        lo, hi = prof[:3].mean(), prof[-3:].mean()
        if rising:
            assert hi > 3 * lo, f"blue spectrum should rise: {prof}"
        else:
            assert lo > 3 * hi, f"red spectrum should fall: {prof}"


def test_profile_positive():
    for kind in ("blue", "red", "white"):
        s = radial_spectrum_profile(32, kind=kind)
        assert np.all(s > 0)


def test_load_generates_and_caches(tmp_path):
    L1 = load_cov_L(res=8, dimension=3, kind="blue", search_dirs=(), cache_dir=str(tmp_path))
    L2 = load_cov_L(res=8, dimension=3, kind="blue", search_dirs=(), cache_dir=str(tmp_path))
    np.testing.assert_array_equal(L1, L2)
    assert (tmp_path / "generated_cov_gaussianBN_L_res8_d3.npz").exists()
