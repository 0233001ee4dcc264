"""YOLOv3-tiny family tests: shapes, weight import, end-to-end predictor."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_for_turbines_tpu import config as cfg
from yolo_for_turbines_tpu.config import ModelConfig
from yolo_for_turbines_tpu.models import yolov3
from yolo_for_turbines_tpu.models.darknet_weights import (
    expected_num_floats,
    export_darknet_weights,
    load_darknet_weights,
)


def tiny_model(num_classes=80):
    return yolov3.YOLOv3(
        ModelConfig(
            num_classes=num_classes, backbone="yolov3_tiny", strides=(32, 16)
        )
    )


def test_tiny_output_shapes():
    model = tiny_model(num_classes=80)
    params, stats = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 416, 416, 3))
    preds, _ = model.apply(params, stats, x, compute_dtype=jnp.float32)
    assert [p.shape for p in preds] == [
        (1, 3, 13, 13, 85),
        (1, 3, 26, 26, 85),
    ]


def test_tiny_matches_official_weight_file_size():
    """yolov3-tiny.weights is 35,434,956 bytes = 20-byte header +
    8,858,734 float32 -- the plan must consume exactly that many."""
    model = tiny_model(num_classes=80)
    assert expected_num_floats(model.plan) == 8_858_734


def test_tiny_weight_roundtrip(tmp_path):
    model = tiny_model(num_classes=2)
    params, stats = model.init(jax.random.PRNGKey(0))
    path = tmp_path / "tiny.weights"
    export_darknet_weights(model.plan, params, stats, str(path))
    params2, stats2 = model.init(jax.random.PRNGKey(9))
    loaded, _, _, consumed = load_darknet_weights(
        str(path), model.plan, params2, stats2
    )
    assert consumed == expected_num_floats(model.plan)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tiny_predictor_end_to_end():
    from yolo_for_turbines_tpu.inference import Predictor

    model = tiny_model(num_classes=2)
    params, stats = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, stats)
    predictor = Predictor(
        model,
        folded,
        anchors=cfg.TINY_ANCHORS,
        image_size=416,
        conf_threshold=0.3,
        max_boxes=32,
        compute_dtype=jnp.float32,
    )
    img = np.random.default_rng(0).integers(0, 255, (300, 400, 3), dtype=np.uint8)
    boxes = predictor.predict_image(img)
    assert isinstance(boxes, list)


def test_tiny_maxpool_stride1_keeps_size():
    from yolo_for_turbines_tpu.models.blocks import maxpool2d

    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = maxpool2d(x, 2, 1)
    assert y.shape == (1, 4, 4, 1)
    # each output = max over the 2x2 window anchored at (i, j) (SAME pad)
    assert float(y[0, 0, 0, 0]) == 5.0
    assert float(y[0, 3, 3, 0]) == 15.0
    y2 = maxpool2d(x, 2, 2)
    assert y2.shape == (1, 2, 2, 1)
    assert float(y2[0, 0, 0, 0]) == 5.0


def test_tiny_training_end_to_end(tmp_path, rng):
    """Train the 2-scale tiny family for a couple of steps through the full
    Trainer path (TINY_ANCHORS, 2-scale targets/loss/eval)."""
    from PIL import Image

    from yolo_for_turbines_tpu.config import TrainConfig
    from yolo_for_turbines_tpu.data.splits import create_csv_files
    from yolo_for_turbines_tpu.train.trainer import train

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i in range(8):
        img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"im{i}.png")
        np.savetxt(
            tmp_path / "labels" / f"im{i}.txt",
            np.array([[i % 2, 0.5, 0.5, 0.4, 0.4]]),
            fmt="%.6f",
        )
    create_csv_files(
        tmp_path / "images", tmp_path / "labels", tmp_path,
        {"train": 0.5, "val": 0.25, "test": 0.25},
    )
    import yolo_for_turbines_tpu.train.trainer as trainer_mod

    orig_init = trainer_mod.Trainer.__init__

    def patched(self, train_cfg, model_cfg=None, **kw):
        model_cfg = ModelConfig(
            num_classes=2, activation=train_cfg.activation,
            backbone="yolov3_tiny", strides=(32, 16),
        )
        orig_init(self, train_cfg, model_cfg=model_cfg, **kw)

    trainer_mod.Trainer.__init__ = patched
    try:
        tc = TrainConfig(
            lr=1e-3, batch_size=4, max_num_steps=2, warmup_enabled=False,
            multi_scale=False, image_size=64, compute_dtype="float32",
        )
        train(
            tc, tmp_path, tmp_path, identifier="tiny", early_stop=2,
            image_folder=tmp_path / "images",
            annotation_folder=tmp_path / "labels",
            anchors=cfg.TINY_ANCHORS, num_workers=2,
        )
    finally:
        trainer_mod.Trainer.__init__ = orig_init
    assert (tmp_path / "best_model_tiny.ckpt").exists()
