"""Demo CLI surfaces (tools/demo.py), including the round-5 trained-
checkpoint serving path — the reference demo's actual deployment shape
(a fine-tuned turbine model, reference: code/demo.py:16-28)."""

import json

import jax
import numpy as np
import pytest
from PIL import Image

from yolo_for_turbines_tpu import config as cfg
from yolo_for_turbines_tpu.config import ModelConfig, TrainConfig
from yolo_for_turbines_tpu.models.yolov3 import YOLOv3
from yolo_for_turbines_tpu.tools.demo import run_cli
from yolo_for_turbines_tpu.train.checkpoint import save_checkpoint
from yolo_for_turbines_tpu.train.steps import create_train_state


def test_cli_checkpoint_path_with_custom_anchors(tmp_path):
    """--checkpoint + --anchors serves an orbax checkpoint end to end
    (tiny backbone keeps the CPU compile cheap)."""
    model = YOLOv3(
        ModelConfig(num_classes=2, activation="mish",
                    backbone="yolov3_tiny", strides=(32, 16))
    )
    state, _, _ = create_train_state(
        model, TrainConfig(), rng=jax.random.PRNGKey(0)
    )
    ckpt = tmp_path / "best_model_demo.ckpt"
    save_checkpoint(state, ckpt)

    anchors_json = tmp_path / "anchors.json"
    anchors_json.write_text(
        json.dumps({"anchors": np.asarray(cfg.TINY_ANCHORS).tolist()})
    )
    img_path = tmp_path / "photo.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
    ).save(img_path)

    out = tmp_path / "pred.png"
    run_cli([
        "--checkpoint", str(ckpt), "--anchors", str(anchors_json),
        "--backbone", "yolov3_tiny", "--num-classes", "2",
        "--activation", "mish", "--image", str(img_path),
        "--out", str(out),
    ])
    assert out.exists()


def test_cli_weights_and_checkpoint_mutually_exclusive(tmp_path, capsys):
    with pytest.raises(SystemExit):
        run_cli(["--weights", "a", "--checkpoint", "b", "--image", "c"])
    with pytest.raises(SystemExit):
        run_cli(["--image", "c"])  # one source is required


def test_cli_missing_model_file_exits(tmp_path):
    img = tmp_path / "x.jpg"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img)
    with pytest.raises(SystemExit):
        run_cli(["--checkpoint", str(tmp_path / "nope.ckpt"),
                 "--image", str(img)])
