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


# ---------------------------------------------------------------------------
# Fused train augmenter
# ---------------------------------------------------------------------------


def test_train_augment_letterbox_geometry():
    """No-aug native call == python letterbox on a smooth image (the 2-tap
    bilinear differs from PIL's antialiased downscale only on high-frequency
    content)."""
    from yolo_for_turbines_tpu.data.augment import letterbox
    from yolo_for_turbines_tpu.native import native_available, train_augment

    if not native_available():
        pytest.skip("no native toolchain")
    y, x = np.mgrid[0:480, 0:640]
    img = np.stack([x * 255 // 640, y * 255 // 480, (x + y) * 255 // 1120], -1)
    img = img.astype(np.uint8)
    out = train_augment(img, 416)
    lb, _ = letterbox(img, None, 416)
    ref = lb.astype(np.float32) / 255.0
    assert np.abs(out - ref).mean() < 5e-3


def test_native_transform_boxes_match_fallback():
    """Native and numpy Transform paths draw the same rng stream and must
    produce bit-identical box labels for any seed."""
    from yolo_for_turbines_tpu.data.augment import set_train_transforms
    from yolo_for_turbines_tpu.native import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    rng0 = np.random.default_rng(3)
    img = rng0.uniform(0, 255, (300, 500, 3)).astype(np.uint8)
    boxes = np.array([[0.5, 0.5, 0.3, 0.3, 0], [0.3, 0.6, 0.2, 0.25, 1]])
    for seed in range(8):
        t_nat = set_train_transforms(416, mosaic=False)
        t_py = set_train_transforms(416, mosaic=False)
        t_py.use_native = False
        a = t_nat(image=img, bboxes=boxes, rng=np.random.default_rng(seed))
        b = t_py(image=img, bboxes=boxes, rng=np.random.default_rng(seed))
        assert a["image"].shape == b["image"].shape == (416, 416, 3)
        assert np.allclose(a["bboxes"], b["bboxes"], atol=1e-12), seed


def test_native_hsv_matches_numpy():
    """C++ per-pixel HSV shift == the vectorized numpy apply_hsv_shift."""
    from yolo_for_turbines_tpu.data.augment import apply_hsv_shift
    from yolo_for_turbines_tpu.native import native_available, train_augment

    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (416, 416, 3)).astype(np.uint8)
    dh, ds, dv = 0.01, 0.1, -0.08
    out = train_augment(img, 416, do_hsv=True, dh=dh, ds=ds, dv=dv)
    ref = apply_hsv_shift(img, dh, ds, dv).astype(np.float32) / 255.0
    # identical math, but numpy path round-trips through uint8 (+-1/255)
    assert np.abs(out - ref).max() < 2.5 / 255.0


def test_hsv_shift_identity():
    """Zero shifts must be a no-op (up to uint8 rounding)."""
    from yolo_for_turbines_tpu.data.augment import apply_hsv_shift

    rng = np.random.default_rng(6)
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    out = apply_hsv_shift(img, 0.0, 0.0, 0.0)
    assert np.abs(out.astype(np.int16) - img.astype(np.int16)).max() <= 1


# ---------------------------------------------------------------------------
# Mosaic cutout sampler
# ---------------------------------------------------------------------------


def _smooth(h, w, phase=0.0):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [255 * x / w, 255 * y / h,
         128 + 100 * np.sin(x / 17 + phase) * np.cos(y / 13)],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_mosaic_native_matches_numpy():
    """Both pixel backends consume the identical rng stream and box math:
    boxes must be BIT-identical; pixels (bilinear vs PIL antialias) within
    +-1 on smooth content. Mixed source sizes exercise quadrant overlap
    clipping (small images leave 255-padded canvas inside the window)."""
    from yolo_for_turbines_tpu.data.mosaic import mosaic_augmentation
    from yolo_for_turbines_tpu.native import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    imgs = [_smooth(480, 640), _smooth(640, 480, 1.0),
            _smooth(123, 77, 2.0), _smooth(300, 300, 3.0)]
    anns = [np.array([[0.5, 0.5, 0.4, 0.4, 0]]),
            np.array([[0.2, 0.3, 0.2, 0.2, 1]]),
            np.array([[0.5, 0.5, 0.9, 0.9, 0]]),
            np.zeros((0, 5))]
    for seed in range(6):
        a_img, a_box = mosaic_augmentation(
            imgs, anns, 416, np.random.default_rng(seed), use_native=True)
        b_img, b_box = mosaic_augmentation(
            imgs, anns, 416, np.random.default_rng(seed), use_native=False)
        if isinstance(a_img, int):  # sentinel: both paths must agree
            assert isinstance(b_img, int)
            continue
        assert np.array_equal(a_box, b_box), seed
        assert a_img.shape == b_img.shape == (416, 416, 3)
        assert a_img.dtype == np.uint8
        d = np.abs(a_img.astype(np.int16) - b_img.astype(np.int16))
        # +-1 everywhere except isolated edge pixels of UPSCALED quadrants,
        # where PIL's and the classic half-pixel bilinear's border handling
        # differ by one more quantization step
        assert d.max() <= 2, (seed, d.max())
        assert (d > 1).mean() < 1e-4, seed
        assert d.mean() < 0.5, (seed, d.mean())


def test_mosaic_native_pad_regions_exact():
    """Canvas pixels no quadrant image covers must be exactly 255 in both
    backends (tiny sources leave most of the window padded)."""
    from yolo_for_turbines_tpu.data.mosaic import mosaic_augmentation
    from yolo_for_turbines_tpu.native import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    imgs = [_smooth(40, 20, i) for i in range(4)]  # resize to (128, 64)
    anns = [np.array([[0.5, 0.5, 0.8, 0.8, 0]]) for _ in range(4)]
    size = 128
    a_img, _ = mosaic_augmentation(
        imgs, anns, size, np.random.default_rng(0), use_native=True)
    b_img, _ = mosaic_augmentation(
        imgs, anns, size, np.random.default_rng(0), use_native=False)
    pad = b_img == 255
    assert pad.any()  # the scenario actually has padding in-window
    assert np.all(a_img[pad] == 255)


def test_letterbox_rounding_half_to_even_matches_python():
    """Exact .5 scale products: the C++ letterbox must round half-to-even
    like Python round() so pixel geometry stays aligned with the box
    geometry (augment.letterbox_box_geometry). 413x832 @ 416 gives
    nh = 206.5 -> 206; half-away-from-zero (lround) would give 207 and
    shift every label by ~1px on such images."""
    from yolo_for_turbines_tpu.data.augment import letterbox_box_geometry
    from yolo_for_turbines_tpu.native import (
        batch_letterbox,
        native_available,
        train_augment,
    )

    if not native_available():
        pytest.skip("no native toolchain")
    size = 416
    for h, w in [(413, 832), (417, 834), (832, 413)]:
        img = np.full((h, w, 3), 255, np.uint8)
        nh, nw, top, left = letterbox_box_geometry(h, w, size)
        content = np.zeros((size, size), bool)
        content[top : top + nh, left : left + nw] = True
        for out in (
            batch_letterbox([img], size)[0],
            train_augment(img, size),
        ):
            assert np.all(out[~content] == 0.0), (h, w)
            assert np.all(out[content] > 0.5), (h, w)
