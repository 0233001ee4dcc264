"""ASHA driver + real Trainer integration on synthetic data (mini model)."""

import numpy as np
import pytest
from PIL import Image

from yolo_for_turbines_tpu import config as cfg
from yolo_for_turbines_tpu.config import ModelConfig
from yolo_for_turbines_tpu.data.splits import create_csv_files
from yolo_for_turbines_tpu.train.hpo import Choice, load_config, tune_model

from helpers import MINI_LAYERS


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("hposynth")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(11)
    for i in range(8):
        img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"im{i}.png")
        np.savetxt(
            root / "labels" / f"im{i}.txt",
            np.array([[i % 2, 0.5, 0.5, 0.4, 0.4]]),
            fmt="%.6f",
        )
    create_csv_files(
        root / "images", root / "labels", root,
        {"train": 0.5, "val": 0.25, "test": 0.25},
    )
    return root


def test_asha_with_real_trainer(synth, tmp_path):
    import yolo_for_turbines_tpu.train.trainer as trainer_mod
    from yolo_for_turbines_tpu.train.trainer import make_hpo_train_fn

    orig_init = trainer_mod.Trainer.__init__

    def patched(self, train_cfg, model_cfg=None, **kw):
        model_cfg = ModelConfig(
            num_classes=cfg.NUM_TURBINE_CLASSES,
            activation=train_cfg.activation,
            layer_config=MINI_LAYERS,
        )
        orig_init(self, train_cfg, model_cfg=model_cfg, **kw)

    trainer_mod.Trainer.__init__ = patched
    try:
        train_fn = make_hpo_train_fn(
            synth, tmp_path,
            image_folder=synth / "images",
            annotation_folder=synth / "labels",
            num_workers=2,
        )
        space = {
            "lr": Choice((1e-3, 5e-4)),
            "batch_size": 4,
            "max_num_steps": 100,
            "warmup_enabled": False,
            "multi_scale": False,
            "image_size": 64,
            "compute_dtype": "float32",
        }
        best = tune_model(
            train_fn, space, num_samples=2, model_folder_path=tmp_path,
            grace_period=1, max_epochs=2, seed=0,
        )
    finally:
        trainer_mod.Trainer.__init__ = orig_init

    assert "config" in best and "mAP" in best
    assert best["config"]["lr"] in (1e-3, 5e-4)
    loaded = load_config(tmp_path, "best_config.json")
    assert loaded == best["config"]
