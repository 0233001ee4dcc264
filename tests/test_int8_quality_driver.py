"""Pin benchmarks/int8_quality.py's eval composition.

The driver quantifies int8-PTQ mAP cost on trained weights (round-5 quality
receipt). Its `eval_map_via_predictor` is new glue — Predictor pipeline
output + loader GT decode + device mAP — so validate it exactly: a stub
predictor that replays the ground truth as its predictions must score
mAP 1.0, and the real folded/int8 mini predictors must run through the
same path.
"""

import importlib.util
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import mini_model
from yolo_for_turbines_tpu import config as cfg
from yolo_for_turbines_tpu.data.loader import get_loaders
from yolo_for_turbines_tpu.data.splits import create_csv_files
from yolo_for_turbines_tpu.data.synthetic import generate_synthetic_dataset
from yolo_for_turbines_tpu.inference import Predictor

_DRIVER = Path(__file__).resolve().parent.parent / "benchmarks" / "int8_quality.py"


@pytest.fixture(scope="module")
def driver():
    spec = importlib.util.spec_from_file_location("int8_quality", _DRIVER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def val_loader(tmp_path_factory):
    root = tmp_path_factory.mktemp("int8q")
    generate_synthetic_dataset(root, num_images=16, image_size=(128, 96))
    create_csv_files(
        root / "images", root / "labels", root,
        {"train": 0.5, "val": 0.5}, image_ext=".jpg",
    )
    _, val, _ = get_loaders(
        root, batch_size=4, anchors=cfg.ANCHORS, train=True,
        image_folder=root / "images", annotation_folder=root / "labels",
        num_workers=2, image_size=64,
    )
    return val


class _GtReplayPredictor:
    """predict_batch returns this batch's OWN ground truth as predictions
    (score 1.0), so the downstream mAP must be exactly 1.0 — an end-to-end
    oracle for the driver's GT decode + accumulation + device-mAP glue."""

    def __init__(self, model, anchors, batches_true):
        self.model = model
        self.anchors = anchors
        self.conf_threshold = cfg.CONF_THRESHOLD
        self._queue = list(batches_true)

    def predict_batch(self, x):
        true = self._queue.pop(0)
        return true, true[..., 4] > self.conf_threshold


def _gt_rows(driver, model, loader, anchors):
    """Decode each batch's finest-scale targets with the driver's own
    gt_step (reused via a throwaway call through the real code path)."""
    import functools

    import jax

    from yolo_for_turbines_tpu.ops.decode import decode_scale

    strides = model.strides

    @functools.partial(jax.jit, static_argnames=("image_size",))
    def gt_step(tf, a, *, image_size):
        grids = cfg.grid_sizes_for(image_size, strides)
        scaled = jnp.asarray(a, jnp.float32) * jnp.asarray(
            grids, jnp.float32
        ).reshape(-1, 1, 1)
        true = decode_scale(tf, scaled[-1], grids[-1], is_pred=False)
        k = min(128, true.shape[1])
        _, idx = jax.lax.top_k(true[..., 4], k)
        return jnp.take_along_axis(true, idx[..., None], axis=1)

    out = []
    for images, targets in loader:
        out.append(
            gt_step(jnp.asarray(targets[-1]), np.asarray(anchors, np.float32),
                    image_size=images.shape[1])
        )
    return out


def test_gt_replay_scores_perfect_map(driver, val_loader):
    model = mini_model()
    anchors = np.asarray(cfg.ANCHORS, np.float32)
    batches_true = _gt_rows(driver, model, val_loader, anchors)
    assert sum(int((t[..., 4] > 0.5).sum()) for t in batches_true) > 0
    stub = _GtReplayPredictor(model, anchors, batches_true)
    m = driver.eval_map_via_predictor(stub, val_loader, anchors, num_classes=2)
    assert m == pytest.approx(1.0, abs=1e-6)


def test_empty_predictions_score_zero(driver, val_loader):
    model = mini_model()
    anchors = np.asarray(cfg.ANCHORS, np.float32)
    batches_true = _gt_rows(driver, model, val_loader, anchors)
    empty = [jnp.zeros_like(t) for t in batches_true]
    stub = _GtReplayPredictor(model, anchors, empty)
    m = driver.eval_map_via_predictor(stub, val_loader, anchors, num_classes=2)
    assert m == pytest.approx(0.0, abs=1e-6)


def test_real_predictor_paths_run(driver, val_loader):
    """Folded-f32 and int8 mini predictors run end to end through the
    driver's eval and return a sane scalar (random weights: the VALUE is
    meaningless, the machinery is what's under test)."""
    import jax

    model = mini_model()
    params, stats = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, stats)
    anchors = np.asarray(cfg.ANCHORS, np.float32)
    pred = Predictor(model, folded, anchors=anchors, image_size=64,
                     compute_dtype=jnp.float32)
    m = driver.eval_map_via_predictor(pred, val_loader, anchors, num_classes=2)
    assert 0.0 <= m <= 1.0
    calib = next(iter(val_loader))[0]
    pred_i8 = Predictor(model, folded, anchors=anchors, image_size=64,
                        compute_dtype=jnp.float32).quantize(jnp.asarray(calib))
    m8 = driver.eval_map_via_predictor(pred_i8, val_loader, anchors,
                                       num_classes=2)
    assert 0.0 <= m8 <= 1.0
