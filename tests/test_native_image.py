"""Parity + perf sanity of the native C++ image transform vs PIL."""

import numpy as np
import pytest

from bndm_tpu.native import fast_transform, get_fastimage


pytestmark = pytest.mark.skipif(get_fastimage() is None, reason="g++ unavailable")


def _pil_pipeline(img_u8, res, hflip):
    from PIL import Image

    im = Image.fromarray(img_u8)
    w, h = im.size
    if w <= h:
        nw, nh = res, max(res, int(round(h * res / w)))
    else:
        nw, nh = max(res, int(round(w * res / h))), res
    im = im.resize((nw, nh), Image.BILINEAR)
    left, top = (nw - res) // 2, (nh - res) // 2
    im = im.crop((left, top, left + res, top + res))
    a = np.asarray(im, np.float32) / 255.0
    if hflip:
        a = a[:, ::-1]
    return np.transpose(a, (2, 0, 1))


@pytest.mark.parametrize("shape,res,hflip", [
    ((48, 80, 3), 32, False),
    ((80, 48, 3), 32, True),
    ((64, 64, 3), 64, False),   # identity resize
    ((100, 100, 3), 64, False),
    ((33, 57, 3), 16, True),
])
def test_matches_pil(shape, res, hflip):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    got = fast_transform(img, res, hflip)
    want = _pil_pipeline(img, res, hflip)
    assert got.shape == want.shape
    # PIL uses 8-bit fixed-point filter coefficients; allow 2 LSB
    diff = np.abs(got - want).max() * 255.0
    assert diff <= 2.0, diff


def test_upscale_path():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = fast_transform(img, 64)
    assert out.shape == (3, 64, 64)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_loader_uses_native(tmp_path):
    from bndm_tpu.data.imagefolder import ImageFolderDataset, make_synthetic_folder

    root = make_synthetic_folder(str(tmp_path / "d"), n=2, res=48)
    ds = ImageFolderDataset(root, res=32)
    out = ds.get(0)
    assert out.shape == (3, 32, 32) and out.dtype == np.float32
