"""ASHA HPO driver tests (no training involved: synthetic objective)."""

import json

import numpy as np
import pytest

from yolo_for_turbines_tpu.train.hpo import (
    ASHAScheduler,
    Choice,
    GridSearch,
    LogUniform,
    Trial,
    Uniform,
    load_config,
    sample_config,
    tune_model,
)


def test_search_space_sampling():
    rng = np.random.default_rng(0)
    space = {
        "lr": LogUniform(1e-4, 1e-1),
        "momentum": Uniform(0.8, 0.99),
        "activation": Choice(("mish", "leaky_relu")),
        "batch_size": 16,
    }
    cfgs = [sample_config(space, rng) for _ in range(50)]
    assert all(1e-4 <= c["lr"] <= 1e-1 for c in cfgs)
    assert all(0.8 <= c["momentum"] <= 0.99 for c in cfgs)
    assert {c["activation"] for c in cfgs} == {"mish", "leaky_relu"}
    assert all(c["batch_size"] == 16 for c in cfgs)


def test_asha_rung_budgets():
    s = ASHAScheduler(grace_period=2, reduction_factor=2, max_t=16)
    assert s.rung_budget(0, 0) == 2
    assert s.rung_budget(0, 1) == 4
    assert s.rung_budget(1, 0) == 4
    assert s.rung_budget(0, 3) == 16


def test_asha_promotes_good_kills_bad():
    s = ASHAScheduler(grace_period=2, reduction_factor=2, brackets=1, max_t=8)
    good = Trial(config={}, id=0, bracket=0)
    bad = Trial(config={}, id=1, bracket=0)
    assert s.on_result(good, 0.9)  # first at rung: promoted
    assert not s.on_result(bad, 0.1)  # below the median cutoff


def test_tune_model_finds_optimum(tmp_path):
    """Objective: mAP = 1 - |lr - 0.01| * 10, improves with epochs; ASHA must
    prefer lr near 0.01."""

    def train_fn(config, num_epochs, resume):
        epochs = (resume or 0) + num_epochs
        score = max(0.0, 1 - abs(config["lr"] - 0.01) * 10) * min(
            1.0, epochs / 8
        )
        return score, epochs

    best = tune_model(
        train_fn,
        {"lr": LogUniform(1e-4, 1e-1)},
        num_samples=16,
        model_folder_path=tmp_path,
        max_epochs=8,
        seed=0,
    )
    assert abs(best["config"]["lr"] - 0.01) < 0.05
    # best_config.json round-trips through load_config (reference parity)
    loaded = load_config(tmp_path, "best_config.json")
    assert loaded == best["config"]


def test_grid_search_expansion(tmp_path):
    seen = []

    def train_fn(config, num_epochs, resume):
        seen.append(config["warmup"])
        return config["warmup"], None

    tune_model(
        train_fn,
        {"warmup": GridSearch((0.01, 0.02, 0.03))},
        num_samples=3,
        model_folder_path=tmp_path,
        max_epochs=2,
    )
    assert set(seen) == {0.01, 0.02, 0.03}
