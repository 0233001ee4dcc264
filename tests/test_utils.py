"""Plotting / profiling / debug utility tests."""

import numpy as np

from yolo_for_turbines_tpu.utils.plotting import plot_image_with_boxes, plot_original
from yolo_for_turbines_tpu.utils.profiling import StepTimer
from yolo_for_turbines_tpu.utils.seed import seed_everything


def test_plot_image_with_boxes_smoke(rng):
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    boxes = [[0.5, 0.5, 0.3, 0.4, 0.9, 0], [0.2, 0.3, 0.1, 0.1, 0.7, 1]]
    out = plot_image_with_boxes(img, boxes, ["dirt", "damage"])
    assert out.size[0] > 0 and out.size[1] > 0
    # no boxes: returns the input unchanged
    out2 = plot_image_with_boxes(img, [], ["dirt", "damage"])
    assert np.asarray(out2).shape == img.shape


def test_plot_original_unletterboxes(rng):
    img = rng.integers(0, 255, (100, 300, 3), dtype=np.uint8)
    boxes = [[0.5, 0.5, 0.2, 0.1, 0.9, 0]]
    out = plot_original(img, (416, 416), boxes, ["dirt", "damage"])
    assert out.size[0] > 0


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        with t.measure():
            pass
    s = t.summary()
    assert s["steps"] == 5 and s["p50_s"] >= 0


def test_seed_everything_returns_key():
    key = seed_everything(7)
    assert key.shape in ((), (2,))  # typed or raw PRNG key
