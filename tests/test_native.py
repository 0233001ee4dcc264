"""Native C++ packer tests: builds with g++, matches the Python letterbox."""

import numpy as np
import pytest

from yolo_for_turbines_tpu.data.augment import letterbox
from yolo_for_turbines_tpu.native import batch_letterbox, native_available


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_python_geometry(rng):
    """Same letterbox geometry: pad bands identical, content within resample
    tolerance of the PIL path."""
    def smooth(h, w):
        # smooth gradient: bilinear (ours) and PIL's antialiased filter both
        # converge to the underlying continuous image, unlike white noise
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack(
            [255 * x / w, 255 * y / h, 128 + 100 * np.sin(x / 17) * np.cos(y / 13)],
            axis=-1,
        )
        return np.clip(img, 0, 255).astype(np.uint8)

    imgs = [smooth(100, 200), smooth(333, 222), smooth(64, 64)]
    size = 128
    got = batch_letterbox(imgs, size)
    assert got.shape == (3, size, size, 3)
    for i, img in enumerate(imgs):
        want, _ = letterbox(img, None, size)
        want = want.astype(np.float32) / 255.0
        # pad regions must be exactly 0 in both
        pad_mask = want == 0.0
        h, w = img.shape[:2]
        scale = size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        top, left = (size - nh) // 2, (size - nw) // 2
        # outside the content window both are exactly pad_value
        content = np.zeros((size, size), bool)
        content[top : top + nh, left : left + nw] = True
        assert np.all(got[i][~content] == 0.0)
        # content agrees within bilinear-vs-PIL tolerance
        diff = np.abs(got[i][content] - want[content])
        assert diff.mean() < 0.03, diff.mean()


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_identity_when_size_matches(rng):
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    out = batch_letterbox([img], 64)
    np.testing.assert_allclose(out[0], img.astype(np.float32) / 255.0, atol=1e-6)


def test_fallback_path_matches(rng, monkeypatch):
    """With the library forced off, the numpy fallback produces the same
    geometry/normalization."""
    import yolo_for_turbines_tpu.native as native

    monkeypatch.setattr(native, "load_library", lambda: None)
    img = rng.uniform(0, 255, (50, 80, 3)).astype(np.uint8)
    out = native.batch_letterbox([img], 96)
    want, _ = letterbox(img, None, 96)
    np.testing.assert_allclose(out[0], want.astype(np.float32) / 255.0, atol=1e-6)
